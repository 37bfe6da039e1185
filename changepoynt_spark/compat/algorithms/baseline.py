from changepoynt_spark.kernels import MovingWindow, ZERO  # noqa: F401
