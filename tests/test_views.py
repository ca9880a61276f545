"""Switch-over surface (sources.views): the reference repo's OWN SQL
text — verbatim verify templates with their Jinja placeholders filled —
runs through spark.sql over the engine's warehouse views and returns
the same verdicts as the engine's verify operators."""

import os

import pytest
from pyspark.sql.utils import AnalysisException

from datawaves_etl_airflow_spark.pipeline.runner import run_evm_day
from datawaves_etl_airflow_spark.sources.views import (
    register_warehouse_views,
    render_reference_sql,
)
from datawaves_etl_airflow_spark.testing import fixtures as fx

_REF_VERIFY_DIR = "/root/reference/dags/resources/verify"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    base = fx.ensure_fixtures()
    wh = str(tmp_path_factory.mktemp("wh_views"))
    run_evm_day(spark, base, wh, fx.DS)
    return wh


class TestWarehouseViews:
    def test_temp_views_queryable(self, spark, warehouse):
        got = register_warehouse_views(spark, warehouse)
        assert "blocks" in got and "traces" in got
        assert spark.sql("SELECT COUNT(*) c FROM blocks").collect()[0]["c"] == 20
        # the dt partition column the reference's SQL filters on exists
        assert "dt" in spark.table("traces").columns

    def test_database_views_two_part_names(self, spark, warehouse):
        register_warehouse_views(spark, warehouse, database="ethereum")
        n = spark.sql(
            "SELECT COUNT(*) c FROM ethereum.transactions"
        ).collect()[0]["c"]
        assert n == 200

    @pytest.mark.skipif(
        not os.path.isdir(_REF_VERIFY_DIR),
        reason="reference verify templates not present",
    )
    def test_reference_verify_sql_runs_verbatim(self, spark, warehouse):
        """Every reference verify template passes against the engine's
        warehouse for the fixture day — green data stays green through
        the reference user's own SQL."""
        register_warehouse_views(spark, warehouse, database="ethereum")
        for fname in sorted(os.listdir(_REF_VERIFY_DIR)):
            sql = render_reference_sql(
                open(os.path.join(_REF_VERIFY_DIR, fname)).read(),
                schema_name="ethereum",
                ds=fx.DS,
            )
            rows = spark.sql(sql).collect()
            assert rows and rows[0][0] == 1, fname

    @pytest.mark.skipif(
        not os.path.isdir(_REF_VERIFY_DIR),
        reason="reference verify templates not present",
    )
    def test_reference_verify_sql_raises_on_missing_day(
        self, spark, warehouse
    ):
        """...and a missing day trips the same raise_error the
        reference relies on."""
        register_warehouse_views(spark, warehouse, database="ethereum")
        sql = render_reference_sql(
            open(os.path.join(_REF_VERIFY_DIR, "blocks_have_latest.sql")).read(),
            schema_name="ethereum",
            ds="1999-01-01",
        )
        with pytest.raises(Exception, match="no latest blocks"):
            spark.sql(sql).collect()
