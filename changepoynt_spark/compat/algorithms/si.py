from changepoynt_spark.kernels import SubspaceIdentification  # noqa: F401
