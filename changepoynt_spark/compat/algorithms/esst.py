from changepoynt_spark.kernels import ESST  # noqa: F401
