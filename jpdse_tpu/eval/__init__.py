from jpdse_tpu.eval.harness import evaluate, add_noise  # noqa: F401
