from gradus_tpu.integrate.status import StatusCodes
from gradus_tpu.integrate.points import GeodesicPoint, unpack_solution
from gradus_tpu.integrate.solver import (
    integrate_rays,
    IntegrationResult,
    CompactedIntegrator,
)
from gradus_tpu.integrate.tracing import (
    Tracer,
    TraceGeodesic,
    TraceRadiativeTransfer,
    trace_geodesics,
    tracegeodesics,
    trace_radiative_transfer,
    trace_windings,
    PoloidalShape,
    event_horizon_chart,
    make_geodesic_rhs,
    domain_upper_hemisphere,
)
