import pytest

from debezium_connector_yugabytedb_1_spark.generator import generate_events, write_events
from debezium_connector_yugabytedb_1_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ybcdc-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_path(spark, tmp_path_factory):
    """Shared deterministic CDC corpus (4000 events, DDL at 2000)."""
    path = str(tmp_path_factory.mktemp("corpus") / "events")
    df = generate_events(
        spark, 4000, n_repos=12, paths_per_repo=8, n_tablets=4, ddl_at=(2000,)
    )
    write_events(df, path)
    return path


@pytest.fixture(scope="session")
def corpus_rows(spark, corpus_path):
    return [r.asDict() for r in spark.read.parquet(corpus_path).collect()]
