from changepoynt_spark.kernels import BOCPD  # noqa: F401
