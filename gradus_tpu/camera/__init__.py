from gradus_tpu.camera.impact import (
    local_momentum,
    map_impact_parameters,
    lnr_momentum_transform,
)
