from lcvo_tpu.parallel import mesh  # noqa: F401
