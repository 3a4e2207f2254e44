from gradus_tpu.parallel.mesh import ray_mesh, P_RAYS, P_NONE
from gradus_tpu.parallel.sharded import (
    sharded_trace,
    sharded_render,
    sharded_lineprofile,
    sharded_emissivity,
    sharded_pallas_trace,
    pad_to_multiple,
)
