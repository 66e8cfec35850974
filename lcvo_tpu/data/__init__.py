from lcvo_tpu.data import synthetic  # noqa: F401
