from changepoynt_spark.kernels import MESST  # noqa: F401
