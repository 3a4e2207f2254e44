from gradus_tpu.geodesics.equation import (
    metric_jacobian,
    geodesic_equation,
    constrain_time,
    constrain,
    constrain_all,
)
from gradus_tpu.geodesics.tetrads import (
    dotproduct,
    propernorm,
    mproject,
    gramschmidt,
    tetradframe,
    tetradframe_matrix,
    lnrframe,
    lnrbasis,
    lnrbasis_matrix,
    lnrframe_matrix,
    lowerindices,
    raiseindices,
)
