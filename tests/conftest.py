import duckdb
import pytest

from bike_analyzer_spark.session import get_spark

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bike-analyzer-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_DIR_ORACLE)
    yield con
    con.close()
