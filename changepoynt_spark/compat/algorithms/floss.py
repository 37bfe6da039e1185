from changepoynt_spark.kernels import FLOSS  # noqa: F401
