import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

# Make repo root + tests dir importable from Spark python workers, so
# classes defined in test modules (pickled by reference) resolve.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO_ROOT, os.path.join(_REPO_ROOT, "tests"), os.environ.get("PYTHONPATH")) if p
)


@pytest.fixture(scope="session")
def spark():
    from pangool_spark.session import get_spark

    spark = get_spark("pangool_spark_tests", **{"spark.sql.shuffle.partitions": "4"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
