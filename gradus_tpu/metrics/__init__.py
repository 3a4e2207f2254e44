from gradus_tpu.metrics.base import (
    AbstractMetric,
    metric_dataclass,
    metric_components,
    metric_4x4,
    inverse_metric_components,
    inner_radius,
    unpack_rtheta,
)
from gradus_tpu.metrics.kerr import KerrMetric, SchwarzschildMetric, kerr_isco
from gradus_tpu.metrics.deformed import (
    JohannsenMetric,
    JohannsenPsaltisMetric,
    NoZMetric,
    BumblebeeMetric,
    DilatonAxion,
)
from gradus_tpu.metrics.exotic import (
    MorrisThorneWormhole,
    KerrRefractive,
    KerrDarkMatter,
)
from gradus_tpu.metrics.kerr_newman import KerrNewmanMetric, faraday_tensor
from gradus_tpu.metrics.minkowski import (
    SphericalMetric,
    CartesianMetric,
    minkowski_matrix,
)
