from gradus_tpu.orbits.circular import CircularOrbits
from gradus_tpu.orbits.special_radii import (
    isco,
    event_horizon,
    ergosphere,
    is_naked_singularity,
)
from gradus_tpu.orbits.plunging import (
    PlungingInterpolation,
    interpolate_plunging_velocities,
)
from gradus_tpu.orbits.solving import (
    solve_equatorial_circular_orbit,
    solve_orbit_theta,
    charged_circular_orbit_omega,
)
