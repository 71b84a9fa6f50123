import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h2h_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("h2h_spark_tests", cpus=8)


@pytest.fixture()
def tmp_work(tmp_path):
    return str(tmp_path)
