from changepoynt_spark.kernels import SST  # noqa: F401
