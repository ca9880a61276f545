"""Table profiling (operators.profile): exact stats verified against
hand-computed values, single-aggregation plan shape pinned."""

import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators.profile import profile_table

SF = "/root/testdata/sf0.001"


class TestProfileTable:
    def test_stats_on_known_frame(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (4, "b", None)],
            "id bigint, s string, v double",
        )
        prof = {r["column"]: r for r in profile_table(df, rsd=0.01).collect()}
        assert set(prof) == {"id", "s", "v"}
        assert all(r["n_rows"] == 4 for r in prof.values())
        assert prof["id"]["n_nulls"] == 0
        assert prof["s"]["n_nulls"] == 1
        assert prof["v"]["n_nulls"] == 2
        assert prof["v"]["null_frac"] == pytest.approx(0.5)
        # exact-small regime: HLL++ is exact at these cardinalities
        assert prof["id"]["approx_distinct"] == 4
        assert prof["s"]["approx_distinct"] == 2
        assert prof["id"]["min_value"] == "1"
        assert prof["id"]["max_value"] == "4"
        assert prof["s"]["min_value"] == "a"
        assert prof["s"]["max_value"] == "b"
        assert prof["id"]["dtype"] == "bigint"

    def test_unorderable_types_get_null_ranges(self, spark):
        df = spark.createDataFrame(
            [(1, [1, 2], bytearray(b"x"))],
            "id bigint, arr array<bigint>, b binary",
        )
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["arr"]["min_value"] is None
        assert prof["b"]["max_value"] is None
        assert prof["arr"]["approx_distinct"] == 1

    def test_empty_table(self, spark):
        df = spark.range(0).select(
            F.col("id"), F.lit("x").alias("s")
        )
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["id"]["n_rows"] == 0
        assert prof["id"]["null_frac"] is None
        assert prof["id"]["approx_distinct"] == 0

    def test_column_subset_and_unknown(self, spark):
        df = spark.read.parquet(f"{SF}/orders.parquet")
        out = profile_table(df, columns=["o_orderkey", "o_totalprice"])
        assert [r["column"] for r in out.collect()] == [
            "o_orderkey", "o_totalprice",
        ]
        with pytest.raises(ValueError, match="unknown columns"):
            profile_table(df, columns=["nope"])

    def test_single_aggregation_plan(self, spark):
        """However many columns are profiled, the plan holds exactly one
        aggregate pair (partial+final) over one scan — no per-column
        jobs."""
        df = spark.read.parquet(f"{SF}/lineitem.parquet")
        plan = (
            profile_table(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan parquet") == 1
        # 2 aggregate nodes = one partial + one final, whatever the
        # physical flavor ("HashAggregate" also matches the substring
        # inside "ObjectHashAggregate", so count the generic suffix)
        assert plan.count("Aggregate(key=") == 2, plan

    def test_real_table_sanity(self, spark):
        df = spark.read.parquet(f"{SF}/orders.parquet")
        prof = {r["column"]: r for r in profile_table(df).collect()}
        n = df.count()
        assert prof["o_orderkey"]["n_rows"] == n
        assert prof["o_orderkey"]["n_nulls"] == 0
        # key column: approx distinct within HLL error of exact n
        assert abs(prof["o_orderkey"]["approx_distinct"] - n) <= 0.1 * n


class TestGroupedQuantiles:
    """grouped_quantiles: exact ≡ percentile semantics, the approx
    switch engages above the group-size bound, and the GK sketch's
    documented rank-error bound (±n/accuracy) actually holds."""

    def _df(self, spark, n_per_group=4000):
        from pyspark.sql import functions as F

        return spark.range(3 * n_per_group).select(
            (F.col("id") % 3).cast("string").alias("g"),
            # deliberately non-uniform values so quantiles are not
            # trivially index-proportional
            ((F.col("id") * F.col("id")) % 9973).cast("double").alias("v"),
        )

    def test_exact_mode_matches_percentile(self, spark):
        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.profile import (
            grouped_quantiles,
        )

        df = self._df(spark)
        got = grouped_quantiles(df, ["g"], "v", [0.25, 0.5, 0.75], mode="exact")
        want = df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.percentile("v", 0.25).alias("q_25"),
            F.percentile("v", 0.5).alias("q_50"),
            F.percentile("v", 0.75).alias("q_75"),
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_auto_switches_on_group_size(self, spark):
        from datawaves_etl_airflow_spark.operators.profile import (
            grouped_quantiles,
        )

        df = self._df(spark)
        # bound above the largest group → exact plan (percentile);
        # bound below → sketch plan (approx_percentile)
        exact_plan = grouped_quantiles(
            df, ["g"], "v", mode="auto", max_exact_group_rows=10_000
        )._jdf.queryExecution().analyzed().toString()
        approx_plan = grouped_quantiles(
            df, ["g"], "v", mode="auto", max_exact_group_rows=100
        )._jdf.queryExecution().analyzed().toString()
        assert "approx_percentile" not in exact_plan
        assert "approx_percentile" in approx_plan

    def test_approx_rank_error_within_documented_bound(self, spark):
        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.profile import (
            grouped_quantiles,
        )

        accuracy = 100  # coarse on purpose: bound = n/accuracy = 40 rows
        df = self._df(spark)
        approx = grouped_quantiles(
            df, ["g"], "v", [0.25, 0.5, 0.75], mode="approx",
            accuracy=accuracy,
        )
        rows = {r["g"]: r for r in approx.collect()}
        for g, r in rows.items():
            n = r["n_rows"]
            tol = n / accuracy + 1
            for p, col in ((0.25, "q_25"), (0.5, "q_50"), (0.75, "q_75")):
                rank = (
                    df.filter(
                        (F.col("g") == g) & (F.col("v") <= r[col])
                    ).count()
                )
                assert abs(rank - p * n) <= tol, (g, p, rank, n)


class TestSnapshotDiff:
    """snapshot_diff: the between-crawls release audit — full-outer
    id join + null-safe per-column comparison."""

    def test_statuses(self, spark):
        from datawaves_etl_airflow_spark.operators.profile import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [
                (1, "same", "s1"),
                (2, "will change", "s1"),
                (3, "will vanish", "s2"),
                (4, None, "s2"),          # NULL -> NULL: unchanged
                (5, None, "s2"),          # NULL -> value: changed
            ],
            "doc_id long, text string, source string",
        )
        new = spark.createDataFrame(
            [
                (1, "same", "s1"),
                (2, "changed!", "s1"),
                (4, None, "s2"),
                (5, "filled in", "s2"),
                (6, "brand new", "s3"),
            ],
            "doc_id long, text string, source string",
        )
        got = {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(old, new).collect()
        }
        assert got == {
            1: "unchanged",
            2: "changed",
            3: "removed",
            4: "unchanged",
            5: "changed",
            6: "added",
        }

    def test_compare_cols_subset_and_validation(self, spark):
        import pytest

        from datawaves_etl_airflow_spark.operators.profile import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, "t", "s1")], "doc_id long, text string, source string"
        )
        new = spark.createDataFrame(
            [(1, "t", "s2")], "doc_id long, text string, source string"
        )
        # only compare text: the source change is invisible
        got = snapshot_diff(old, new, compare_cols=["text"]).collect()
        assert got[0]["status"] == "unchanged"
        with pytest.raises(ValueError, match="compare_cols"):
            snapshot_diff(old, new, compare_cols=["nope"])


class TestCorpusStats:
    """corpus_stats: the one-row data card."""

    def test_values(self, spark):
        from datawaves_etl_airflow_spark.operators.profile import (
            corpus_stats,
        )

        d = spark.createDataFrame(
            [
                (1, "one two three", "web", "en"),
                (2, "four five", "web", "en"),
                (3, "six", "books", "fr"),
            ],
            "doc_id long, text string, source string, lang string",
        )
        r = corpus_stats(d).first()
        assert r["n_docs"] == 3 and r["n_tokens"] == 6
        assert r["n_chars"] == len("one two three") + len("four five") + 3
        assert r["mean_doc_tokens"] == 2.0
        assert r["n_sources"] == 2 and r["top_source"] == "web"
        assert r["n_langs"] == 2 and r["top_lang"] == "en"

    def test_modal_tiebreak_is_value_asc(self, spark):
        from datawaves_etl_airflow_spark.operators.profile import (
            corpus_stats,
        )

        d = spark.createDataFrame(
            [
                (1, "a", "zeta", "en"),
                (2, "b", "alpha", "en"),
            ],
            "doc_id long, text string, source string, lang string",
        )
        assert corpus_stats(d).first()["top_source"] == "alpha"
