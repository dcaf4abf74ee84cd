import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from techtalk_data_pipeline_snowpark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=int(os.environ.get("PYTEST_SPARK_CORES", "8")),
                  extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "lake")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
