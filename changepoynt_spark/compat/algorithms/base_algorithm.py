from changepoynt_spark.kernels import Algorithm  # noqa: F401
