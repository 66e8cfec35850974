from lcvo_tpu.solve.ba import schur, window  # noqa: F401
