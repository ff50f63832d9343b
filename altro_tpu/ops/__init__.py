from altro_tpu.ops.smallmat import psd_solve_small
