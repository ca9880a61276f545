"""Sampling / dataset-partitioning operators (operators.sampling)."""

from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators import sampling

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestAssignSplit:
    def test_fractions_and_determinism(self, spark):
        d = sampling.assign_split(_docs(spark))
        counts = {r["split"]: r["n"] for r in
                  d.groupBy("split").agg(F.count("*").alias("n")).collect()}
        n = sum(counts.values())
        assert n == 500
        # 75/12.5/12.5 nominal; binomial noise at n=500 stays well inside
        assert 0.65 <= counts["train"] / n <= 0.85
        assert 0.06 <= counts["val"] / n <= 0.20
        assert 0.06 <= counts["test"] / n <= 0.20
        # membership is a pure function of the id: repartitioning the
        # input must not move any row between splits
        again = sampling.assign_split(_docs(spark).repartition(7))
        assert (
            d.select("doc_id", "split")
            .exceptAll(again.select("doc_id", "split"))
            .count()
            == 0
        )

    def test_boundaries_partition_the_corpus(self, spark):
        d = sampling.assign_split(_docs(spark))
        assert d.filter(F.col("split").isNull()).count() == 0
        assert d.count() == _docs(spark).count()


class TestSampleByHash:
    def test_subset_and_stable(self, spark):
        docs = _docs(spark)
        s64 = sampling.sample_by_hash(docs, "doc_id", 64)
        s128 = sampling.sample_by_hash(docs, "doc_id", 128)
        n64, n128 = s64.count(), s128.count()
        # nominal 125 and 250 of 500
        assert 80 <= n64 <= 170
        assert 190 <= n128 <= 310
        # monotone: a smaller keep-fraction is a subset of a larger one
        assert s64.join(s128, "doc_id", "left_anti").count() == 0


def _order():
    return [F.col("n_chars").desc(), F.col("doc_id").asc()]


class TestCapPerGroup:
    def test_cap_applied(self, spark):
        capped = sampling.cap_per_group(_docs(spark), "source", _order(), 10)
        per = capped.groupBy("source").agg(F.count("*").alias("n"))
        assert per.filter(F.col("n") > 10).count() == 0
        # rank is dense 1..min(n, k) per group
        assert capped.filter(F.col("rk") > 10).count() == 0

    def test_prefiltered_identical_to_plain(self, spark):
        docs = _docs(spark)
        plain = sampling.cap_per_group(docs, "source", _order(), 7)
        salted = sampling.cap_per_group_prefiltered(
            docs, "source", _order(), 7, id_col="doc_id", salt_buckets=4
        )
        cols = ["doc_id", "source", "n_chars", "rk"]
        assert (
            plain.select(*cols).exceptAll(salted.select(*cols)).count() == 0
        )
        assert plain.count() == salted.count()


class TestPackSequences:
    def test_packing_golden_single_shard(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c"),          # 3 tokens, offset 0, seqs 0-0
                (2, "d e f g"),        # 4 tokens, offset 3, seqs 0-0
                (3, "h i j k l m"),    # 6 tokens, offset 7, straddles
                (4, "n"),              # 1 token, offset 13, seq 1
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in sampling.pack_sequences(
                docs, budget=8, shard_col=F.lit(0)
            ).collect()
        }
        assert [out[i]["offset"] for i in (1, 2, 3, 4)] == [0, 3, 7, 13]
        assert (out[3]["seq_start"], out[3]["seq_end"]) == (0, 1)
        assert (out[4]["seq_start"], out[4]["seq_end"]) == (1, 1)

    def test_empty_docs_dropped_and_shards_independent(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "x y"),
                (1, "p q r"),
                (2, "   "),
                (3, ""),
                (4, "z"),
            ],
            ["doc_id", "text"],
        )
        out = sampling.pack_sequences(
            docs, budget=4, shard_col=F.pmod(F.col("doc_id"), F.lit(2))
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert set(by_id) == {0, 1, 4}  # whitespace-only and empty gone
        # offsets restart per shard: shard 0 holds ids 0,4; shard 1 id 1
        assert by_id[0]["offset"] == 0 and by_id[1]["offset"] == 0
        assert by_id[4]["offset"] == 2


class TestPackSequencesProperties:
    def test_invariants_on_random_corpora(self, spark):
        # deterministic pseudo-random corpora; per-shard packing
        # invariants must hold for any input:
        #   offsets are the exclusive prefix sum of token counts
        #   (contiguous, gap-free), seq bounds bracket each doc
        import random

        rng = random.Random(17)
        words = ["alpha", "beta", "g", "dd", "longwordhere"]
        docs = [
            (i, " ".join(rng.choice(words)
                         for _ in range(rng.randrange(0, 40))))
            for i in range(200)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        budget = 64
        out = sampling.pack_sequences(
            df, budget, F.pmod(F.col("doc_id"), F.lit(4))
        ).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        n_nonempty = sum(1 for _, t in docs if t.strip())
        assert sum(len(v) for v in by_shard.values()) == n_nonempty
        for shard, rows in by_shard.items():
            rows.sort(key=lambda r: r["doc_id"])
            expect_offset = 0
            for r in rows:
                text = next(t for i, t in docs if i == r["doc_id"])
                assert r["n_tokens"] == len(text.split())
                assert r["offset"] == expect_offset
                assert r["seq_start"] == r["offset"] // budget
                assert r["seq_end"] == (
                    (r["offset"] + r["n_tokens"] - 1) // budget
                )
                assert r["seq_start"] <= r["seq_end"]
                expect_offset += r["n_tokens"]


class TestTemperatureSample:
    """temperature_sample: integer quota math hand-checked per alpha,
    md5-rank selection deterministic, salted variant identical."""

    ROWS = (
        [(i, "A") for i in range(16)]
        + [(i, "B") for i in range(16, 20)]
        + [(20, "C")]
    )

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, source string")

    def _kept(self, out):
        kept = {}
        for r in out.collect():
            kept.setdefault(r["source"], []).append(r["doc_id"])
        return {k: sorted(v) for k, v in kept.items()}

    def test_alpha_half_quotas(self, spark):
        # n = {A:16, B:4, C:1} -> w = 1e6*{4,2,1}, tot 7e6,
        # quotas = 10*w DIV tot = {A:5, B:2, C:1}
        out = sampling.temperature_sample(
            self._df(spark), "source", total_budget=10, alpha=0.5
        )
        q = {r["source"]: r["quota"] for r in out.collect()}
        assert q == {"A": 5, "B": 2, "C": 1}
        kept = self._kept(out)
        assert [len(kept["A"]), len(kept["B"]), len(kept["C"])] == [5, 2, 1]
        # ranks are contiguous from 1 within each group
        rks = sorted(
            r["rk"] for r in out.collect() if r["source"] == "A"
        )
        assert rks == [1, 2, 3, 4, 5]

    def test_alpha_one_is_natural_and_can_zero_out(self, spark):
        # w = 1e6*{16,4,1}, tot 21e6 -> quotas {A:7, B:1, C:0}:
        # natural proportions starve the tail source at this budget
        out = sampling.temperature_sample(
            self._df(spark), "source", total_budget=10, alpha=1
        )
        kept = self._kept(out)
        assert len(kept["A"]) == 7 and len(kept["B"]) == 1
        assert "C" not in kept

    def test_alpha_zero_is_uniform(self, spark):
        # equal weights -> 10 DIV 3 = 3 per source; C has only 1 row
        out = sampling.temperature_sample(
            self._df(spark), "source", total_budget=10, alpha=0
        )
        kept = self._kept(out)
        assert [len(kept["A"]), len(kept["B"]), len(kept["C"])] == [3, 3, 1]

    def test_budget_is_an_upper_bound(self, spark):
        for alpha in (0, 0.5, 1, 0.3):
            out = sampling.temperature_sample(
                self._df(spark), "source", total_budget=7, alpha=alpha
            )
            assert out.count() <= 7

    def test_deterministic_and_salted_variant_identical(self, spark):
        base = sampling.temperature_sample(
            self._df(spark), "source", total_budget=10, alpha=0.5
        )
        again = sampling.temperature_sample(
            self._df(spark), "source", total_budget=10, alpha=0.5
        )
        salted = sampling.temperature_sample(
            self._df(spark),
            "source",
            total_budget=10,
            alpha=0.5,
            salt_buckets=4,
        )
        rows = lambda df: sorted(  # noqa: E731
            (r["doc_id"], r["source"], r["quota"], r["rk"])
            for r in df.collect()
        )
        assert rows(base) == rows(again) == rows(salted)

    def test_real_table_flattens_mixture(self, spark):
        # alpha=0.5 must lift the smallest source's share and cut the
        # largest's, relative to natural proportions at the same budget
        docs = _docs(spark)
        natural = sampling.temperature_sample(
            docs, "source", total_budget=200, alpha=1
        )
        flat = sampling.temperature_sample(
            docs, "source", total_budget=200, alpha=0.5
        )

        def share(df):
            per = {
                r["source"]: r["n"]
                for r in df.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            return per

        nat, fl = share(natural), share(flat)
        sizes = {
            r["source"]: r["n"]
            for r in docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        big = max(sizes, key=sizes.get)
        small = min(sizes, key=sizes.get)
        assert fl.get(small, 0) >= nat.get(small, 0)
        assert fl[big] <= nat[big]


class TestBudgetPerGroup:
    """budget_per_group: the weight-denominated quota — kept set is a
    clean prefix of the preference order, never exceeding the
    budget."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                # (id, source, weight); preference order = id asc
                (1, "a", 300),
                (2, "a", 400),
                (3, "a", 500),   # cum 1200 > 1000 — cut here
                (4, "a", 100),   # after the cut: excluded (prefix rule)
                (1000, "b", 900),
                (1001, "b", 200),  # cum 1100 > 1000
                (2000, "c", 5000),  # single row over budget: excluded
            ],
            "doc_id long, source string, w long",
        )

    def test_prefix_and_strict_budget(self, spark):
        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.sampling import (
            budget_per_group,
        )

        out = budget_per_group(
            self._docs(spark),
            "source",
            [F.col("doc_id").asc()],
            budget=1000,
            weight_col="w",
        )
        rows = {r["doc_id"]: r["cum_w"] for r in out.collect()}
        assert rows == {1: 300, 2: 700, 1000: 900}
        # no group exceeds the budget, and doc 4 (after the overflow)
        # is excluded even though it would individually fit — the
        # kept set is a PREFIX, not a best-fit knapsack
        assert 4 not in rows and 3 not in rows and 2000 not in rows

    def test_integer_cumsum_and_all_kept_under_budget(self, spark):
        from pyspark.sql import functions as F

        from datawaves_etl_airflow_spark.operators.sampling import (
            budget_per_group,
        )

        out = budget_per_group(
            self._docs(spark),
            "source",
            [F.col("doc_id").asc()],
            budget=10_000,
            weight_col="w",
        )
        assert out.count() == 7  # everything fits
        assert dict(out.dtypes)["cum_w"] == "bigint"


class TestStratifiedSample:
    """stratified_sample: equal-mass quality strata + deterministic
    md5 pick per stratum; boundaries form = the map-side scale path,
    pinned ≡ ntile when given the exact cuts."""

    def _scored(self, spark, with_null=False):
        from pyspark.sql import functions as F

        rows = [(i, float(i)) for i in range(40)]
        if with_null:
            rows.append((100, None))
        return spark.createDataFrame(rows, "doc_id long, score double")

    def test_ntile_form_equal_mass_and_deterministic(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            stratified_sample,
        )

        out = stratified_sample(
            self._scored(spark), "score", n_strata=4, per_stratum=3
        ).collect()
        assert len(out) == 12
        by_stratum = {}
        for r in out:
            by_stratum.setdefault(r["stratum"], []).append(r)
        assert set(by_stratum) == {1, 2, 3, 4}
        for stratum, rows in by_stratum.items():
            assert len(rows) == 3
            # stratum membership follows the score deciles exactly
            for r in rows:
                assert (stratum - 1) * 10 <= r["doc_id"] < stratum * 10
        # re-run identical (md5 membership is layout/run-pure)
        again = stratified_sample(
            self._scored(spark).repartition(7), "score",
            n_strata=4, per_stratum=3,
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_boundaries_form_matches_ntile_on_exact_cuts(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            stratified_sample,
        )

        ntile = sorted(
            map(
                tuple,
                stratified_sample(
                    self._scored(spark), "score", 4, 3
                ).collect(),
            )
        )
        mapped = sorted(
            map(
                tuple,
                stratified_sample(
                    self._scored(spark), "score", 4, 3,
                    boundaries=[9.0, 19.0, 29.0],
                ).collect(),
            )
        )
        assert ntile == mapped

    def test_null_scores_land_in_stratum_one_both_forms(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            stratified_sample,
        )

        for kw in ({}, {"boundaries": [9.0, 19.0, 29.0]}):
            out = stratified_sample(
                self._scored(spark, with_null=True), "score", 4, 50,
                **kw,
            )
            row = out.filter("doc_id = 100").collect()
            assert row and row[0]["stratum"] == 1

    def test_validation(self, spark):
        import pytest

        from datawaves_etl_airflow_spark.operators.sampling import (
            stratified_sample,
        )

        d = self._scored(spark)
        with pytest.raises(ValueError, match="n_strata"):
            stratified_sample(d, "score", 0, 3)
        with pytest.raises(ValueError, match="per_stratum"):
            stratified_sample(d, "score", 4, 0)
        with pytest.raises(ValueError, match="boundaries"):
            stratified_sample(d, "score", 4, 3, boundaries=[1.0])
        with pytest.raises(ValueError, match="boundaries"):
            stratified_sample(
                d, "score", 4, 3, boundaries=[3.0, 2.0, 1.0]
            )
        # non-strict duplicates would silently EMPTY a stratum
        with pytest.raises(ValueError, match="STRICTLY"):
            stratified_sample(
                d, "score", 4, 3, boundaries=[5.0, 5.0, 9.0]
            )


class TestLeakageSafeSplit:
    """leakage_safe_split: near-dups can never straddle the eval
    boundary — the hash is keyed on the cluster, not the doc."""

    def _corpus(self, spark):
        from pyspark.sql import functions as F

        base = spark.createDataFrame(
            [
                (i, f"unique document number {i} with its own words "
                    f"entirely about subject {i * 7} and nothing else")
                for i in range(60)
            ],
            "doc_id long, text string",
        )
        # 20 planted exact-dup pairs (i, i+1000), i < 20
        copies = base.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
        return base.unionByName(copies)

    def test_pairs_never_straddle_and_plain_split_does(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            assign_split,
            leakage_safe_split,
        )

        corpus = self._corpus(spark)
        safe = {
            r["doc_id"]: r["split"]
            for r in leakage_safe_split(
                corpus, threshold=0.8
            ).collect()
        }
        plain = {
            r["doc_id"]: r["split"]
            for r in assign_split(corpus).collect()
        }
        # every planted pair lands together under the safe split
        for i in range(20):
            assert safe[i] == safe[i + 1000], i
        # ...whereas the per-doc hash split separates at least one
        # pair (the leakage this operator exists to prevent; with 20
        # pairs the per-pair separation odds make this deterministic
        # for these fixed ids)
        assert any(plain[i] != plain[i + 1000] for i in range(20))

    def test_singletons_agree_with_assign_split(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            assign_split,
            leakage_safe_split,
        )

        corpus = self._corpus(spark)
        safe = {
            r["doc_id"]: (r["split"], r["split_key"])
            for r in leakage_safe_split(
                corpus, threshold=0.8
            ).collect()
        }
        plain = {
            r["doc_id"]: r["split"]
            for r in assign_split(corpus).collect()
        }
        # docs with no near-dup keep their own id as the key and so
        # agree with the plain split exactly
        for i in range(20, 60):
            assert safe[i] == (plain[i], i)

    def test_cluster_key_is_component_min(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            leakage_safe_split,
        )

        corpus = self._corpus(spark)
        keys = {
            r["doc_id"]: r["split_key"]
            for r in leakage_safe_split(
                corpus, threshold=0.8
            ).collect()
        }
        for i in range(20):
            assert keys[i] == i and keys[i + 1000] == i


class TestEpochUpsample:
    """epoch_upsample: full epochs + deterministic md5 remainder —
    the up-sampling half of mixture execution."""

    def _docs(self, spark):
        rows = [(i, "small") for i in range(10)] + [
            (100 + i, "big") for i in range(40)
        ]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_full_epochs_plus_remainder(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._docs(spark), "source", {"small": 25, "big": 20}
        ).collect()
        small = [r for r in out if r["source"] == "small"]
        big = [r for r in out if r["source"] == "big"]
        # small: 25 = 2 full epochs of 10 + 5 remainder at epoch 2
        assert len(small) == 25
        assert sorted(
            {r["epoch"] for r in small if True}
        ) == [0, 1, 2]
        assert sum(1 for r in small if r["epoch"] == 2) == 5
        # big: 20 < 40 → zero full epochs, 20-row remainder at epoch 0
        assert len(big) == 20 and {r["epoch"] for r in big} == {0}
        # (id, epoch) unique
        assert len({(r["doc_id"], r["epoch"]) for r in out}) == len(out)

    def test_remainder_is_md5_deterministic(self, spark):
        import hashlib

        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._docs(spark), "source", {"big": 3}
        ).collect()
        got = sorted(
            r["doc_id"] for r in out if r["source"] == "big"
        )
        want = sorted(
            sorted(
                range(100, 140),
                key=lambda i: (
                    hashlib.md5(str(i).encode()).hexdigest(), i
                ),
            )[:3]
        )
        assert got == want

    def test_group_without_quota_passes_through(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._docs(spark), "source", {"small": 20}
        ).collect()
        big = [r for r in out if r["source"] == "big"]
        assert len(big) == 40 and {r["epoch"] for r in big} == {0}

    def test_max_epochs_clamps(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
        )

        out = epoch_upsample(
            self._docs(spark), "source", {"small": 100},
            max_epochs=2.5,
        ).collect()
        small = [r for r in out if r["source"] == "small"]
        # clamp: floor(2.5 * 10) = 25, not 100
        assert len(small) == 25


class TestExecuteMixture:
    """execute_mixture: both mixture directions through the shared
    quota math + epoch split."""

    def _docs(self, spark):
        rows = [(i, "small") for i in range(5)] + [
            (100 + i, "big") for i in range(45)
        ]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_both_directions_hit_exact_quotas(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            execute_mixture,
        )

        # alpha=0: uniform 20/20 quotas from a 40-row budget —
        # small (5 docs) upsamples 4x, big (45) caps at 20
        out = execute_mixture(
            self._docs(spark), "source", total_budget=40, alpha=0
        ).collect()
        small = [r for r in out if r["source"] == "small"]
        big = [r for r in out if r["source"] == "big"]
        assert len(small) == 20 and len(big) == 20
        assert {r["epoch"] for r in small} == {0, 1, 2, 3}
        assert {r["epoch"] for r in big} == {0}

    def test_cap_direction_equals_temperature_sample_set(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            execute_mixture,
            temperature_sample,
        )

        d = self._docs(spark)
        mix = execute_mixture(d, "source", total_budget=8, alpha=0.5)
        cap = temperature_sample(d, "source", total_budget=8, alpha=0.5)
        got = sorted(
            (r["doc_id"], r["source"])
            for r in mix.filter("source = 'big'").collect()
        )
        want = sorted(
            (r["doc_id"], r["source"])
            for r in cap.filter("source = 'big'").collect()
        )
        # the down-selected group keeps the IDENTICAL md5-ranked set
        assert got == want and len(got) > 0

    def test_integer_group_keys_via_dict(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            epoch_upsample,
        )

        d = spark.createDataFrame(
            [(i, i % 2) for i in range(10)], "doc_id long, grp long"
        )
        out = epoch_upsample(
            d, "grp", {0: 10, 1: 2}, id_col="doc_id"
        ).collect()
        assert sum(1 for r in out if r["grp"] == 0) == 10
        assert sum(1 for r in out if r["grp"] == 1) == 2


class TestSplitLeakageReport:
    """split_leakage_report: the audit leakage_safe_split's guarantee
    is asserted against."""

    def _near_dup_corpus(self, spark):
        base = [
            " ".join(f"w{i}_{j}" for j in range(8)) for i in range(12)
        ]
        rows = []
        for i, t in enumerate(base):
            rows.append((2 * i, t))
            rows.append((2 * i + 1, t + " extra"))  # near-dup twin
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_plain_hash_split_leaks_cluster_split_does_not(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            assign_split,
            leakage_safe_split,
            split_leakage_report,
        )

        d = self._near_dup_corpus(spark)
        leaky = split_leakage_report(
            assign_split(d), threshold=0.5, n_bands=32
        ).collect()
        cross = sum(
            r["n_pairs"] for r in leaky if r["split_a"] != r["split_b"]
        )
        total = sum(r["n_pairs"] for r in leaky)
        assert total == 12  # every twin pair found (full recall here)
        assert cross > 0    # the per-doc hash split leaks
        safe = split_leakage_report(
            leakage_safe_split(d, threshold=0.5), threshold=0.5,
            n_bands=32,
        ).collect()
        assert sum(r["n_pairs"] for r in safe) == 12
        assert all(r["split_a"] == r["split_b"] for r in safe)
