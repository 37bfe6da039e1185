import os
import sys

import pytest

# repo root on sys.path so `import changepoynt_spark` / `import tests.*` work
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope='session')
def spark():
    from changepoynt_spark.session import get_spark
    spark = get_spark(app_name='changepoynt-spark-tests', master='local[4]',
                      shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope='session')
def sf_dir():
    return os.environ.get('SPARK_GRAFT_TEST_SF_DIR', '/root/testdata/sf0.001')
