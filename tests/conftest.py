import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPARK = None


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession (local[*], AQE + Arrow on)."""
    global _SPARK
    if _SPARK is None:
        from gliner_spark.session import get_spark

        _SPARK = get_spark(app_name="gliner-spark-tests")
    return _SPARK
