from diffsim_tpu.core import image, prng, schedulers  # noqa: F401
