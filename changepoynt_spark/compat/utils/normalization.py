from changepoynt_spark.kernels.normalization import *  # noqa: F401,F403
