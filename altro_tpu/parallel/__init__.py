from altro_tpu.parallel.batch import batch_init_state, batched_tracking_solver, vmap_solve
from altro_tpu.parallel.mesh import make_mesh, sharded_tracking_solver
from altro_tpu.parallel.horizon import tvlqr_backward_horizon_sharded
from altro_tpu.parallel.mesh import initialize_distributed
