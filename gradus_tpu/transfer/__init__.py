from gradus_tpu.transfer.solvers import (
    find_offset_for_radius,
    impact_parameters_for_radius,
    offset_workhorse,
    rtheta_to_alphabeta,
)
from gradus_tpu.transfer.cunningham import (
    TransferBranchGrid,
    cunningham_transfer_function,
    transferfunctions,
    interpolated_transfer_branches,
    g_to_gstar,
    gstar_to_g,
)
from gradus_tpu.transfer.integration import (
    integrate_lineprofile,
    integrate_lagtransfer,
)
from gradus_tpu.transfer.tables import (
    CunninghamTransferTable,
    make_transfer_function_table,
    LineProfileModel,
)
from gradus_tpu.transfer.integration import integrate_lagtransfer_timedep
from gradus_tpu.transfer.targets import (
    closest_approach,
    optimize_for_target,
    impact_parameters_for_target,
    is_visible,
)
