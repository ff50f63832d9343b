from altro_tpu.io.scotty import load_scotty, synthetic_scotty
