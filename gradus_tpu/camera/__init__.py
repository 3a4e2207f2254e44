from gradus_tpu.camera.impact import (
    local_momentum,
    map_impact_parameters,
    lnr_momentum_transform,
)
from gradus_tpu.camera.grids import (
    LinearGrid,
    GeometricGrid,
    InverseGrid,
    SinGrid,
    CosGrid,
    LogisticGrid,
)
from gradus_tpu.camera.planes import PolarPlane, CartesianPlane
from gradus_tpu.camera.pointfns import (
    PointFunction,
    FilterPointFunction,
    FilterStatusCode,
    ConstPointFunctions,
)
from gradus_tpu.camera.render import (
    rendergeodesics,
    prerendergeodesics,
    EndpointRenderCache,
    apply,
)
from gradus_tpu.camera.adaptive import (
    AdaptiveGrid2D,
    adaptive_render,
    adaptive_sky,
    fill_sky_values,
)
