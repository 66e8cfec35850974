from lcvo_tpu.ops import (  # noqa: F401
    harris,
    interp,
    klt,
    pyramid,
)
