from altro_tpu.parallel.batch import batch_init_state, batched_tracking_solver, vmap_solve
from altro_tpu.parallel.mesh import make_mesh, sharded_tracking_solver
