import pytest

from datawaves_etl_airflow_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "tests",
        conf={"spark.sql.shuffle.partitions": "4"},
        warehouse_dir=wh,
    )
    yield s
