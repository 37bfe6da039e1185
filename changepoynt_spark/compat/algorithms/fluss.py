from changepoynt_spark.kernels import FLUSS  # noqa: F401
