"""Headline benchmark: representative engine queries at sf0.1.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is materialized through Spark's noop sink so the full plan
(including every output column) executes — ``count()`` alone would let
Catalyst prune away most of the work.

``--ab <git-ref>`` runs the INTERLEAVED A/B protocol instead (r9
verdict task 8): sequential snapshot-then-HEAD pairs are exposed to
monotonic box drift (the r9 verdict's two same-box A/Bs disagreed in
direction purely from run order), so this mode alternates
snapshot/HEAD SAMPLES per query — drift hits both sides of every pair
equally and cancels by construction. One Spark JVM serves both code
versions: the snapshot is a throwaway git worktree, and the two
versions' Python modules are swapped in and out of ``sys.modules``
between samples (queries are pure ``(spark, sf_dir) → DataFrame``
functions, so the JVM neither knows nor cares which world built the
plan). Prints one JSON line with per-query ``{head, snap, ratio}``
min-of-3s and flags ratios outside ±15%.

KNOWN BLIND SPOT (by design of the one-JVM swap): the swap covers
DRIVER-side plan construction only. Pandas-UDF/mapInPandas BODIES
(the image/audio feature queries, parts of decode) are pickled BY
REFERENCE and re-imported on the pre-forked Python workers from the
repo path — so snapshot samples execute HEAD code inside UDF bodies,
and a regression confined to a UDF body reads ~1.0 here. The
sequential bench (min-of-3 vs best-ever, box-normalized) remains the
detector for that class; --ab settles the JVM-plan class, which is
where every historical flag has lived. The output JSON carries this
caveat so a recorded A/B can't be over-read later.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: the headline query list (name → module attr); --ab resolves the
#: same names in both code versions, skipping ones a version lacks
BENCH_QUERY_NAMES = [
    # relational core
    ("generic", "q1_pricing_summary"),
    ("generic", "j1_order_revenue_3way"),
    ("generic", "j5_composite_key_join"),
    ("generic", "w1_topk_per_user"),
    ("generic", "h1_hourly_events"),
    ("generic", "t1_topk_orders"),
    ("generic", "aj1_asof_clicks"),
    ("generic", "rj1_promo_range_join"),
    ("generic", "j6c_anti_join_bucket_pruned"),
    ("generic", "h2_range_pruned_scan"),
    # domain pipeline (fixture day: scans + 3-way join + decode)
    ("domain", "d_enrich_transactions"),
    ("domain", "evt_transfer_decode"),
    # LLM-data operators
    ("llm", "llm_dedup_exact"),
    ("llm", "llm_minhash_dedup"),
    ("llm", "llm_jaccard_pairs"),
    ("llm", "llm_dedup_clusters"),
    ("llm", "llm_decontaminate"),
    ("llm", "llm_simhash_candidates"),
    ("llm", "llm_cosine_topk"),
    ("llm", "llm_neardup_embeddings"),
    ("llm", "llm_text_stats"),
    ("llm", "llm_pii_scrub"),
    ("llm", "llm_tfidf_keywords"),
    ("llm", "llm_quality_logit"),
    ("llm", "llm_pack_sequences"),
    ("llm", "llm_chunking"),
    ("llm", "llm_corpus_pipeline"),
    ("llm", "llm_image_features"),
    ("llm", "llm_audio_features"),
    # r13 addition: the ExactSubstr dedup family head (grams tier —
    # the oracle-registered plan). The other r13 ops are training /
    # e2e compositions (10–25 s at sf0.1) that would dominate this
    # ~20 s headline total; they are covered by parity + scalecheck,
    # and the e2e slot is pipeline_day's job.
    ("llm", "llm_exact_substr_dedup"),
]

_PKG = "datawaves_etl_airflow_spark"


class _World:
    """One code version's imported query modules, swappable into
    sys.modules — module identity is the ONLY global state the query
    functions depend on, so activating a world is a dict update, not a
    process restart (which would cost a ~20 s Spark boot per sample
    and make interleaving impractical)."""

    def __init__(self, root: str):
        self.root = root
        self.modules: dict[str, object] = {}
        self.queries: dict[str, object] = {}

    def activate(self) -> None:
        for k in [k for k in sys.modules if k.split(".")[0] == _PKG]:
            del sys.modules[k]
        sys.modules.update(self.modules)
        if self.modules:
            return
        # first activation: import under this world's root
        import importlib

        sys.path.insert(0, self.root)
        try:
            mods = {
                m: importlib.import_module(f"{_PKG}.queries.{m}")
                for m in ("domain", "generic", "llm")
            }
            # the e2e pipeline day is A/B'd too (r11 verdict task 2:
            # pipeline_day_sec had no A/B protection) — import its
            # module tree under this world's root so a later
            # sys.modules lookup resolves to this world's code
            for extra in (f"{_PKG}.pipeline.runner", f"{_PKG}.testing.fixtures"):
                try:
                    importlib.import_module(extra)
                except Exception:
                    pass  # a world without the runner skips the day A/B
        finally:
            sys.path.remove(self.root)
        for _mod, mod in mods.items():
            if hasattr(mod, "ensure_fixtures"):
                mod.ensure_fixtures()
        for mod_name, qname in BENCH_QUERY_NAMES:
            fn = getattr(mods[mod_name], qname, None)
            if fn is not None:
                self.queries[qname] = fn
        self.modules = {
            k: v
            for k, v in sys.modules.items()
            if k.split(".")[0] == _PKG
        }

    def deactivate(self) -> None:
        self.modules = {
            k: v
            for k, v in sys.modules.items()
            if k.split(".")[0] == _PKG
        }
        for k in list(self.modules):
            del sys.modules[k]


def _warmup(spark, sf_dir: str) -> None:
    """Touch every source, force one codegen'd shuffle, pre-fork the
    UDF workers and stage the domain fixtures — so timed runs measure
    steady-state plans, not JVM/reader/worker init."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ["lineitem", "orders", "customer", "events", "documents",
              "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    spark.range(1000).groupBy(F.col("id") % 7).count().count()
    from datawaves_etl_airflow_spark.operators import dedup as _dedup

    _dedup.minhash_dedup_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    ).write.format("noop").mode("overwrite").save()
    from datawaves_etl_airflow_spark.operators import multimodal as _mm

    _mm.extract_binary_meta(
        _mm.attach_binary_payload(
            spark.range(64).repartition(32).selectExpr(
                "id AS doc_id", "CAST(id AS STRING) AS text"
            )
        )
    ).write.format("noop").mode("overwrite").save()
    from datawaves_etl_airflow_spark.queries import domain as _domain

    _domain.ensure_fixtures()
    _domain._staged(spark, "logs").limit(1).count()
    _domain._staged(spark, "blocks").limit(1).count()


def _world_fingerprint(root: str) -> str:
    """md5 over the package's .py bytes — emitted per world so a
    recorded A/B is self-auditing: identical fingerprints mean the two
    worlds ran the same code (a mis-specified ref, or a diff confined
    to non-package files), so a flat result proves nothing."""
    import hashlib

    h = hashlib.md5()
    pkg = os.path.join(root, _PKG)
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                with open(os.path.join(dirpath, fn), "rb") as f:
                    h.update(fn.encode())
                    h.update(f.read())
    return h.hexdigest()[:12]


def run_ab(ref: str) -> None:
    """Interleaved A/B vs a git ref — see the module docstring."""
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", wt, ref],
        check=True,
        capture_output=True,
    )
    try:
        from datawaves_etl_airflow_spark.session import get_spark

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        spark = get_spark(
            "bench-ab", conf={"spark.ui.showConsoleProgress": "false"}
        )
        spark.sparkContext.setLogLevel("ERROR")
        _warmup(spark, sf_dir)

        head = _World(repo)
        snap = _World(wt)
        head.activate()  # adopts the already-imported HEAD modules
        head.deactivate()
        snap.activate()
        snap.deactivate()

        def _sample(world: _World, qname: str) -> float:
            world.activate()
            try:
                spark.catalog.clearCache()
                t0 = time.time()
                world.queries[qname](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                return time.time() - t0
            finally:
                world.deactivate()

        results: dict[str, dict] = {}
        shared = [
            q for _m, q in BENCH_QUERY_NAMES
            if q in head.queries and q in snap.queries
        ]
        for qname in shared:
            # one untimed run per side (JIT + plan compilation), then
            # 3 alternating timed pairs — drift cancels within pairs
            _sample(snap, qname)
            _sample(head, qname)
            snap_t, head_t = [], []
            for _ in range(3):
                snap_t.append(_sample(snap, qname))
                head_t.append(_sample(head, qname))
            s, h = min(snap_t), min(head_t)
            results[qname] = {
                "snap": round(s, 3),
                "head": round(h, 3),
                "ratio": round(h / s, 3) if s > 0 else None,
            }
        skipped = [
            q for _m, q in BENCH_QUERY_NAMES if q not in shared
        ]

        # --- pipeline-day A/B (r11 verdict task 2): the e2e product
        # headline gets the same interleaved protocol as the queries —
        # fresh temp warehouse per run, min-of-2 pairs after one
        # untimed pair (the day runs ~8s; 3 pairs would double the
        # mode's runtime for one number)
        def _day_sample(world: _World) -> float | None:
            import tempfile

            world.activate()
            try:
                runner = sys.modules.get(f"{_PKG}.pipeline.runner")
                domain = sys.modules.get(f"{_PKG}.queries.domain")
                fx = sys.modules.get(f"{_PKG}.testing.fixtures")
                if runner is None or fx is None or domain is None:
                    return None
                base = fx.ensure_fixtures()
                with tempfile.TemporaryDirectory() as wh:
                    spark.catalog.clearCache()
                    t0 = time.time()
                    runner.run_evm_day(
                        spark, base, wh, fx.DS,
                        decode_events=[domain.TRANSFER_EVENT],
                    )
                    return time.time() - t0
            finally:
                world.deactivate()

        pipeline_day = None
        if _day_sample(snap) is not None and _day_sample(head) is not None:
            day_s, day_h = [], []
            for _ in range(2):
                day_s.append(_day_sample(snap))
                day_h.append(_day_sample(head))
            s, h = min(day_s), min(day_h)
            pipeline_day = {
                "snap": round(s, 3),
                "head": round(h, 3),
                "ratio": round(h / s, 3) if s > 0 else None,
            }

        flags = {
            q: r["ratio"]
            for q, r in results.items()
            if r["ratio"] is not None and abs(r["ratio"] - 1) > 0.15
        }
        if (
            pipeline_day is not None
            and pipeline_day["ratio"] is not None
            and abs(pipeline_day["ratio"] - 1) > 0.15
        ):
            flags["pipeline_day_e2e"] = pipeline_day["ratio"]
        head_fp = _world_fingerprint(repo)
        snap_fp = _world_fingerprint(wt)
        out = {
            "metric": "ab_interleaved",
            "ref": ref,
            "head_fingerprint": head_fp,
            "snap_fingerprint": snap_fp,
            "worlds_differ": head_fp != snap_fp,
            "total_head": round(
                sum(r["head"] for r in results.values()), 3
            ),
            "total_snap": round(
                sum(r["snap"] for r in results.values()), 3
            ),
            "queries": results,
            "pipeline_day_e2e": pipeline_day,
            "flags_outside_15pct": flags,
            "skipped_not_in_both": skipped,
            "timing": "interleaved min-of-3 pairs, cache cleared per "
            "sample, one JVM, module-world swap",
            "caveat": "driver-side plans only: pandas-UDF bodies run "
            "HEAD code on both sides (pickled by reference, workers "
            "import from the repo path) — UDF-body regressions are "
            "the sequential bench's job",
        }
        print(json.dumps(out))
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


def main() -> None:
    from datawaves_etl_airflow_spark.queries import domain, generic, llm
    from datawaves_etl_airflow_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(
        "bench", conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    mods = {"domain": domain, "generic": generic, "llm": llm}
    bench_queries = {
        qname: getattr(mods[mod_name], qname)
        for mod_name, qname in BENCH_QUERY_NAMES
    }

    # warmup (shared with --ab): sources, codegen, UDF workers, fixtures
    from pyspark.sql import functions as F

    _warmup(spark, sf_dir)

    # three timed executions per query, report the min: the
    # benchmark's claim is steady-state plan cost, and a single shot
    # folds in one-time plan compilation and whatever the machine was
    # doing that second (observed single-shot variance on an
    # otherwise-idle 32-core box is ±50% for sub-second queries;
    # min-of-2 still flagged one spurious 1.65× "regression" in r3,
    # hence min-of-3 per the r3 verdict)
    # one untimed execution per query first: C2 JIT compilation of the
    # generated whole-stage code is measured to dominate the first 1-2
    # executions (q1 runs 0.98 → 0.72 s across six runs with no code
    # change), and the benchmark's claim is steady-state cost
    # --- box-calibration probe (r7 verdict task 5; resized r9) ---------
    # BENCH_r07's 17 "regressions_vs_best_ever" flags were 100% box
    # scatter (same-box A/B: r6 snapshot 22.46s vs r7 HEAD 21.05s —
    # HEAD faster, recorded file slower), but the recorded file had no
    # way to show that. This probe is a FIXED synthetic workload —
    # spark.range → xxhash64 → 1024-bucket hash aggregate, no repo
    # operators, no files, identical plan every round by construction —
    # so its ratio to the best calibration ever recorded estimates
    # today's box speed, and the regression gate below can report
    # box-normalized ratios that a future reader can trust without
    # re-running an A/B.
    #
    # v2 (r8 verdict): the v1 probe ran 20M rows in 0.28-0.31s — the
    # exact duration band where this suite's documented single-shot
    # variance is ±15-50%, so box_speed_vs_best could mislead in
    # EITHER direction (the r8 judge run saw calibration draw a fast
    # sample while queries drew slow ones, inflating normalized ratios
    # to 1.44-1.63 on untouched code). v2 runs 100× the rows and takes
    # the MEDIAN of 5 timed runs instead of min-of-3: the median of a
    # multi-second workload is robust to one slow sample AND one lucky
    # one. Sizing was measured, not guessed (r9 build box, idle):
    # per-run fixed overhead is ~0.4s, so 160M rows (0.65s) and 640M
    # (1.2s) still showed 17-41% median spread; at 2G rows (~2.6s,
    # compute-dominated) three independent medians-of-5 landed within
    # ±4.6% and every single sample within ±4% — an order of magnitude
    # tighter than the per-query single-shot noise it normalizes.
    # v1 and v2 values are NOT comparable, so best-cal scanning is
    # keyed on calibration_probe == "v2" (BENCH_CAL.json seeds the
    # baseline; pre-v2 BENCH_r*.json calibrations are ignored).
    def _calibration_sec() -> float:
        samples = []
        for _ in range(5):
            t0 = time.time()
            (
                spark.range(0, 2_000_000_000, 1, 32)
                .selectExpr("xxhash64(id) AS h")
                .groupBy((F.col("h") % 1024).alias("b"))
                # pmod keeps the SUM far from long overflow (ANSI mode
                # raises on it; raw xxhash64 sums overflow immediately)
                .agg(
                    F.sum(F.pmod(F.col("h"), F.lit(1000000))).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            samples.append(time.time() - t0)
        samples.sort()
        return round(samples[len(samples) // 2], 3)

    # one untimed execution: JIT the generated code first (cheap
    # single run at reduced scale is NOT enough — C2 keeps compiling
    # into the first full-scale run)
    (
        spark.range(0, 2_000_000_000, 1, 32)
        .selectExpr("xxhash64(id) AS h")
        .groupBy((F.col("h") % 1024).alias("b"))
        .agg(
            F.sum(F.pmod(F.col("h"), F.lit(1000000))).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calibration = _calibration_sec()

    timings: dict[str, float] = {}
    for name, fn in bench_queries.items():
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(3):
            # queries that persist() intermediates (minhash sets etc.)
            # would otherwise hand run 2 a warm InMemoryRelation via the
            # CacheManager and the min would report cache-hit time, not
            # steady-state plan cost — and caches would pile up across
            # the whole query list
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # full pipeline day (load → enrich → verify → parse, 20 tables in
    # one session — the reference runs ~30 spark-submit JVMs for the
    # same day); reported separately so the query total stays a pure
    # query benchmark
    import tempfile

    from datawaves_etl_airflow_spark.pipeline.runner import run_evm_day
    from datawaves_etl_airflow_spark.queries.domain import TRANSFER_EVENT
    from datawaves_etl_airflow_spark.testing import fixtures as fx

    base = fx.ensure_fixtures()
    with tempfile.TemporaryDirectory() as wh:
        t0 = time.time()
        run_evm_day(spark, base, wh, fx.DS, decode_events=[TRANSFER_EVENT])
        pipeline_day = round(time.time() - t0, 3)

    out = {
        "metric": "engine_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "pipeline_day_sec": pipeline_day,
        "calibration_sec": calibration,
        "calibration_probe": "v2",
        "sf": sf,
        "timing": "min-of-3, cache cleared before each run",
    }

    # regression gate (r3 verdict): per-query ratio vs the BEST time
    # ever recorded across all prior rounds' BENCH_r*.json — not just
    # last round — so a slow creep over rounds can't hide. >1.3× is
    # surfaced in the JSON itself.
    repo = os.path.dirname(os.path.abspath(__file__))
    best_ever: dict[str, float] = {}
    import glob as _glob

    best_cal: float | None = None
    for path in sorted(_glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            for name, t in (parsed.get("queries") or {}).items():
                if isinstance(t, (int, float)) and t > 0:
                    best_ever[name] = min(best_ever.get(name, t), t)
            # only v2 calibrations are comparable (the v1 probe was 8×
            # smaller; see the probe comment above)
            c = parsed.get("calibration_sec")
            if (
                parsed.get("calibration_probe") == "v2"
                and isinstance(c, (int, float))
                and c > 0
            ):
                best_cal = c if best_cal is None else min(best_cal, c)
        except (OSError, ValueError):
            continue
    # committed seed baseline so the very first v2 round normalizes
    # against something (recorded on the r9 build box, idle)
    try:
        with open(os.path.join(repo, "BENCH_CAL.json")) as f:
            seed = json.load(f)
        c = seed.get("calibration_sec")
        if (
            seed.get("calibration_probe") == "v2"
            and isinstance(c, (int, float))
            and c > 0
        ):
            best_cal = c if best_cal is None else min(best_cal, c)
    except (OSError, ValueError):
        pass
    # box speed today vs the fastest box any recorded round ran on:
    # 1.0 = as fast as ever measured; 1.25 = everything should read
    # ~25% slower for reasons that have nothing to do with the code
    box = (
        round(calibration / best_cal, 3)
        if best_cal is not None
        else None
    )
    if box is not None:
        out["box_speed_vs_best"] = box
        # r14 (r13 verdict Next #6, ADDITIVE field only — the timed
        # methodology above is byte-unchanged): the same numbers with
        # today's box-drift divided out, so a round-over-round or
        # cross-core-count comparison can self-correct for a degraded
        # window (r13's driver window ran 1.94× slow and every raw
        # number looked like a regression) without re-deriving the
        # normalization from BENCH_CAL.json by hand.
        if box > 0:
            out["calibration_normalized"] = {
                "value": round(out["value"] / box, 3),
                "pipeline_day_sec": round(pipeline_day / box, 3),
                "queries": {
                    k: round(v / box, 3) for k, v in timings.items()
                },
            }
    regressions = {
        name: round(timings[name] / best_ever[name], 2)
        for name in timings
        if name in best_ever and timings[name] / best_ever[name] > 1.3
    }
    if regressions:
        out["regressions_vs_best_ever"] = regressions
        # the self-explaining companion: raw ratio ÷ box ratio. A
        # query that is slow ONLY because the box is slow normalizes
        # back under the gate; what survives here is a real candidate
        # regression worth an A/B.
        if box is not None and box > 0:
            normalized = {
                name: round(r / box, 2)
                for name, r in regressions.items()
                if r / box > 1.3
            }
            out["regressions_box_normalized"] = normalized

    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--ab":
        # hard-fail on a missing ref: silently falling through to the
        # single-version bench would hand an automation expecting the
        # ab_interleaved payload a different schema — or worse, record
        # single-version numbers as an A/B result
        if len(sys.argv) < 3 or not sys.argv[2].strip():
            print("usage: bench.py --ab <git-ref>", file=sys.stderr)
            sys.exit(2)
        run_ab(sys.argv[2])
    else:
        main()
