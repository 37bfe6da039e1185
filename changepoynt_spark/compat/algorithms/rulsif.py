from changepoynt_spark.kernels import RuLSIF  # noqa: F401
