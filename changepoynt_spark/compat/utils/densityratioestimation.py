from changepoynt_spark.kernels.density_ratio import *  # noqa: F401,F403
