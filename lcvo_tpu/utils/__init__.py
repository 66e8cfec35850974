from lcvo_tpu.utils import checkpoint  # noqa: F401
