from changepoynt_spark.kernels import MSST  # noqa: F401
