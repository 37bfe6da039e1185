from changepoynt_spark.kernels.linalg import *  # noqa: F401,F403
