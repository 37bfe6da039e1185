from changepoynt_spark.kernels import ULSIF  # noqa: F401
