from changepoynt_spark.kernels import CLASP  # noqa: F401
