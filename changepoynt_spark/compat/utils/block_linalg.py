from changepoynt_spark.kernels.block import *  # noqa: F401,F403
