from lcvo_tpu.core import geometry, state  # noqa: F401
