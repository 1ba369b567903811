from diffsim_tpu.ops import attention, blocks, taps  # noqa: F401
