from changepoynt_spark.kernels import TESST  # noqa: F401
