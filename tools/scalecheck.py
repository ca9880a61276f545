"""Scale-elasticity check: time representative operators at 1× and N×
the sf0.1 inputs (synthetic scale-up by unioning shifted copies) and
report the runtime ratio — evidence for SCALE.md that the plans grow
sub-linearly in wall-clock on a fixed 32-core box (compute per row is
flat; a ratio ≪ N means the 1× run is overhead-dominated, a ratio ≈ N
means compute-bound and embarrassingly parallel, a ratio ≫ N means a
super-linear term is hiding — the thing this check exists to catch).

Copies are PERTURBED so similarity workloads keep realistic selectivity
(documents get a per-copy token appended; embeddings scale one
dimension per copy), otherwise every copy is an exact duplicate and the
pair volume explodes quadratically by construction instead of by data.

Usage: python tools/scalecheck.py [--factor 8] [--sf /root/testdata/sf0.1]
Prints one JSON line: {"factor": N, "ops": {name: {"t1": s, "tN": s,
"ratio": r}}}.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _scaled_lineitem(spark, sf_dir: str, factor: int) -> DataFrame:
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    copies = [
        l.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out

def _scaled_docs(spark, sf_dir: str, factor: int) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = [
        d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytoken{i}")).alias("text"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _scaled_docs_with_source(spark, sf_dir: str, factor: int) -> DataFrame:
    # the _scaled_docs shape with the source column preserved — the
    # source_overlap op groups by it (sources stay FIXED as the corpus
    # grows: how real mixtures grow)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = [
        d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytoken{i}")).alias("text"),
            "source",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _scaled_docs_broken_runs(
    spark, sf_dir: str, factor: int, every: int = 8
) -> DataFrame:
    """_scaled_docs, but the per-copy token is spliced every ``every``
    words instead of appended once — no run of ≥ every+2 words can
    span two copies, so run-dedup workloads scale by DATA, not by the
    synthetic whole-document duplication the suffix form creates."""
    from datawaves_etl_airflow_spark.operators.dedup import tokenize

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = tokenize(F.col("text"))
    copies = []
    for i in range(factor):
        chunks = F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.size(ws) + every - 1) / every - 1, F.lit(0)
                ).cast("int"),
            ),
            lambda j: F.concat_ws(
                " ",
                F.array_join(F.slice(ws, j * every + 1, every), " "),
                F.lit(f"copytoken{i}"),
            ),
        )
        copies.append(
            d.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                F.array_join(chunks, " ").alias("text"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _scaled_embs(spark, sf_dir: str, factor: int) -> DataFrame:
    # Copies get a per-(copy, dim) deterministic SIGN pattern, not a
    # one-dim rescale: rescaling flips no signs, so every copy of a
    # vector shared the same sign-LSH signature AND cosine ≈ 0.99 with
    # every other copy — the 100× corpus became 100-cliques of true
    # near-dups in every band/cell, and the pair stage measured that
    # quadratic construction artifact (the 100× neardup run spilled
    # >50 GB of candidate pairs), not the plan. Sign-flipping half the
    # dims per copy keeps norms and marginals identical while
    # decorrelating copies, so candidate selectivity stays realistic
    # as the corpus grows. Copy 0 is the untouched original.
    copies = []
    for i in range(factor):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        flip = (
            F.transform(
                F.col("embedding"),
                lambda x, j: F.when(
                    F.pmod(F.xxhash64(F.lit(i), j), F.lit(2)) == 0,
                    x.cast("double"),
                ).otherwise(-x.cast("double")),
            )
            if i
            else F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            )
        )
        copies.append(
            e.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                flip.alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-separated op subset (default: all) — the "
        "factor-100 spot-check samples the flattest paths plus the "
        "valved band-join family at two decades: "
        "--factor 100 --ops evt_decode_bucket_pruned,"
        "incremental_probe_fixed_batch,ann_probe_pruned,cell_outliers,"
        "neardup_banded,semantic_dedup",
    )
    args = ap.parse_args()
    selected = set(args.ops.split(",")) if args.ops else None

    def wanted(*names: str) -> bool:
        return selected is None or bool(selected & set(names))

    from datawaves_etl_airflow_spark.operators import (
        dedup,
        profile,
        similarity,
        text,
        valves,
    )
    from datawaves_etl_airflow_spark.session import get_spark

    spark = get_spark(
        "scalecheck",
        conf={
            "spark.ui.showConsoleProgress": "false",
            # the synthetic N× inputs push real data through the local
            # JVM; the default 1g heap under-provisions a 32-thread run
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def q1(l: DataFrame) -> DataFrame:
        return (
            l.filter(F.col("l_shipdate") < F.lit("1997-12-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.floor(F.col("l_quantity") * 100).cast("bigint")).alias("q"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def j5(l: DataFrame) -> DataFrame:
        pairs = (
            l.groupBy("l_partkey", "l_suppkey")
            .agg(F.count(F.lit(1)).alias("pair_lines"))
            .filter(F.col("pair_lines") >= 3)
        )
        return l.join(pairs, ["l_partkey", "l_suppkey"], "inner").groupBy(
            "l_partkey"
        ).agg(F.count(F.lit(1)).alias("n"))

    def j1(mult: int) -> DataFrame:
        # 3-way fact⋈fact⋈dim: facts scale with the factor, the
        # customer dim stays fixed (how real corpora grow)
        l = _scaled_lineitem(spark, args.sf, mult)
        o = spark.read.parquet(f"{args.sf}/orders.parquet")
        orders = o
        if mult > 1:
            copies = [
                o.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000)
                )
                for i in range(mult)
            ]
            orders = copies[0]
            for c in copies[1:]:
                orders = orders.unionByName(c)
        cust = spark.read.parquet(f"{args.sf}/customer.parquet")
        # pin the 100 TB plan: fact⋈fact is sort-merge (a unioned
        # parquet fact side can size-estimate under the broadcast
        # threshold and OOM the driver — broadcast by ROLE, not by
        # estimate), dim is broadcast
        return (
            l.join(orders.hint("merge"), l["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100).cast("bigint")
                ).alias("rev_cents"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    # pre-build MinHash indexes OUTSIDE the clock: the incremental
    # probe's claim is that daily cost is O(batch + candidates), not
    # O(corpus) — so the measured quantity is probe time with a FIXED
    # batch while the indexed corpus grows by the factor
    import tempfile

    idx_root = tempfile.mkdtemp(prefix="scalecheck_idx_")
    idx_by_mult: dict[int, str] = {}
    if wanted("incremental_probe_fixed_batch"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"m{mult}")
            dedup.write_minhash_index(_scaled_docs(spark, args.sf, mult), p)
            idx_by_mult[mult] = p
    probe_batch = (
        spark.read.parquet(f"{args.sf}/documents.parquet")
        .limit(500)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe")).alias("text"),
        )
    )

    # persisted BM25 inverted index (r9): the probe's claim is that a
    # fixed query set reads only its terms' buckets — so measure a
    # FIXED 5-query probe against a 10×/100× indexed corpus (bucket
    # count fixed: pruning ratio is per-term, independent of corpus)
    bm25_by_mult: dict[int, str] = {}
    if wanted(
        "bm25_probe_pruned",
        "bm25_probe_pruned_valved",
        "hard_negatives_probe_pruned",
        "hard_negatives_probe_pruned_valved",
    ):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"bm25_{mult}")
            text.write_bm25_index(
                _scaled_docs(spark, args.sf, mult), p, n_buckets=64
            )
            bm25_by_mult[mult] = p
    # persisted-PRF twin (r10): own indexes with the forward layout —
    # the claim is that BOTH passes + forward mining stay bucket-pruned
    # as the corpus grows (mining reads a FIXED |Q|·fb_docs docs'
    # forward buckets; the residual is the probed buckets' own growth,
    # the bm25_probe_pruned shape paid ~three times)
    bm25f_by_mult: dict[int, str] = {}
    if wanted("prf_probe_pruned"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"bm25f_{mult}")
            text.write_bm25_index(
                _scaled_docs(spark, args.sf, mult), p, n_buckets=64,
                forward=True,
            )
            bm25f_by_mult[mult] = p
    bm25_queries = (
        spark.read.parquet(f"{args.sf}/documents.parquet")
        .limit(5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, 6), " "
            ).alias("query_text"),
        )
        .localCheckpoint()
    )

    # pre-built IVF indexes, same rationale: the ANN claim is that a
    # probe reads nprobe/n_centroids of the corpus, so measure a FIXED
    # query set against a growing indexed corpus — with the exact
    # brute-force scan as the what-pruning-avoids baseline
    ivf_by_mult: dict[int, str] = {}
    if wanted("ann_probe_pruned"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"ivf{mult}")
            similarity.write_ivf_index(
                _scaled_embs(spark, args.sf, mult), p,
                n_centroids=64, n_iters=1,
            )
            ivf_by_mult[mult] = p
    # int8-cell twin of the same layout: the probe's residual cost is
    # the probed cells' scan, and this tier cuts those bytes ~7× — so
    # its ratio must track ann_probe_pruned's or better
    ivf8_by_mult: dict[int, str] = {}
    if wanted("ann_probe_pruned_int8"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"ivf8_{mult}")
            similarity.write_ivf_index(
                _scaled_embs(spark, args.sf, mult), p,
                n_centroids=64, n_iters=1, cell_storage="int8",
            )
            ivf8_by_mult[mult] = p
    # product-quantized twin (r9): one more decade of probed-cell scan
    # bytes below int8 (16 tinyint codes vs 64 q bytes per row)
    ivfpq_by_mult: dict[int, str] = {}
    if wanted("ann_probe_pruned_pq"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"ivfpq_{mult}")
            similarity.write_ivf_index(
                _scaled_embs(spark, args.sf, mult), p,
                n_centroids=64, n_iters=1, cell_storage="pq",
                pq_m=16, pq_k=256,
            )
            ivfpq_by_mult[mult] = p
    ann_queries = (
        spark.read.parquet(f"{args.sf}/embeddings.parquet")
        .limit(50)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("query_vec"),
        )
        .localCheckpoint()
    )

    # tombstone-delete twin (r10): a FIXED-size pending delete set (a
    # day's takedowns do not scale with corpus size) against a scaled
    # corpus — the probe's extra cost is one anti-join whose build
    # side is the tombstone set, so the ratio must track
    # ann_probe_pruned's (the anti-join is corpus-independent). Own
    # index copies: tombstones are version state and would leak into
    # ann_probe_pruned's probes if the layouts were shared.
    ivfdel_by_mult: dict[int, str] = {}
    if wanted("ann_probe_deleted"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"ivfdel_{mult}")
            scaled = _scaled_embs(spark, args.sf, mult)
            similarity.write_ivf_index(
                scaled, p, n_centroids=64, n_iters=1,
            )
            similarity.delete_from_ivf_index(
                scaled.select("vec_id").limit(1000), p,
                delete_token="scalecheck",
            )
            ivfdel_by_mult[mult] = p

    # index-backed decontamination (r10): a FIXED benchmark set probes
    # a 10×/100× indexed corpus — the large-benchmark leakage gate's
    # claim is O(|benchmark| × probed cells), never a corpus scan, so
    # it shares the ann_probe_pruned shape (and reuses its indexes).
    decon_bench = None
    if wanted("decontaminate_probe_pruned"):
        decon_bench = (
            spark.read.parquet(f"{args.sf}/embeddings.parquet")
            .limit(200)
            .select(
                (F.col("vec_id") + F.lit(800_000_000)).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        for mult in sorted({1, args.factor}):
            if mult not in ivf_by_mult:
                p = os.path.join(idx_root, f"ivf{mult}")
                similarity.write_ivf_index(
                    _scaled_embs(spark, args.sf, mult), p,
                    n_centroids=64, n_iters=1,
                )
                ivf_by_mult[mult] = p

    # streaming semantic ingest (r8 verdict task 4): the claim is
    # O(batch + probed cells) per micro-batch — a FIXED batch against
    # an index whose corpus AND cell count both grow by the factor
    # (the SemDeDup operating regime: k ∝ n keeps cell size constant,
    # so the probed-cells leg stays O(batch·cell_size)). Indexes are
    # 2-level (balanced ~√k × √k levels) so the batch assignment pays
    # O(√k)/row — the shape TestStreamSemanticScaledK plan-pins — and
    # the int8 twin measures the reduced-scan-bytes tier end to end.
    sem_by_mult: dict[tuple[int, str], str] = {}
    if wanted("stream_semantic_fixed_batch", "stream_semantic_fixed_batch_int8"):
        storages = [
            s
            for s, op in [
                ("raw", "stream_semantic_fixed_batch"),
                ("int8", "stream_semantic_fixed_batch_int8"),
            ]
            if wanted(op)
        ]
        for mult in sorted({1, args.factor}):
            side = max(2, round(math.sqrt(16 * mult)))
            for storage in storages:
                p = os.path.join(idx_root, f"sem_{storage}_{mult}")
                similarity.write_ivf_index(
                    _scaled_embs(spark, args.sf, mult), p,
                    n_centroids=side, n_iters=1, n_fine=side,
                    cell_storage=storage,
                )
                sem_by_mult[(mult, storage)] = p
    sem_batch = (
        spark.read.parquet(f"{args.sf}/embeddings.parquet")
        .limit(200)
        .select(
            (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("embedding"),
        )
        .localCheckpoint()
    )

    def _run_sem_ingest(mult: int, storage: str) -> DataFrame:
        # eager by construction: the ingest batch fn executes inside
        # the timed build. Fresh accepted dir per run (the replay
        # marker is per-path); the index fold reuses its deterministic
        # batch token, so repeats overwrite their own batch dir
        # instead of accreting corpus.
        from datawaves_etl_airflow_spark.streaming.ingest import (
            make_semantic_ingest,
        )

        acc = tempfile.mkdtemp(prefix="scalecheck_semacc_")
        fn = make_semantic_ingest(
            sem_by_mult[(mult, storage)], acc, threshold=0.95
        )
        fn(sem_batch, 0)
        return spark.range(1)

    # decode path (D-1/D-2, the reference's core product — round-4
    # verdict #5): synthetic enriched logs/traces scaled by row count,
    # ~1/4 matching the Transfer selector so the filter has realistic
    # selectivity; payloads decode through the real Arrow-batched codec
    # UDF. Noise rows carry 8 distinct selectors so the bucketed layout
    # spreads across selector_hash partitions and pruning has work to do.
    from datawaves_etl_airflow_spark.functions.evm import (
        hash_bucket,
        unhex_0x,
    )
    from datawaves_etl_airflow_spark.operators import decode as dec
    from datawaves_etl_airflow_spark.queries.domain import (
        TRANSFER_EVENT,
        TRANSFER_FUNCTION,
    )

    def _word(c):
        return F.lpad(F.conv(c.cast("string"), 10, 16), 64, "0")

    def _synth_logs(mult: int) -> DataFrame:
        topic0 = TRANSFER_EVENT.event_topic0()
        is_t = (F.col("id") % 4) == 0
        noise = F.concat(F.lit("0x"), _word(F.col("id") % 8 + 100))
        sel = F.when(is_t, F.lit(topic0)).otherwise(noise)
        topics = F.array(
            sel,
            F.concat(F.lit("0x"), _word(F.col("id") % 997)),
            F.concat(F.lit("0x"), _word(F.col("id") % 131)),
        )
        data = F.concat(F.lit("0x"), _word(F.col("id") % 100000))
        return spark.range(200_000 * mult).select(
            F.col("id").alias("log_index"),
            F.concat(F.lit("0xtx"), F.col("id").cast("string")).alias(
                "transaction_hash"
            ),
            F.concat(
                F.lit("0x"),
                F.lpad(
                    F.conv((F.col("id") % 500).cast("string"), 10, 16),
                    40,
                    "0",
                ),
            ).alias("address"),
            F.timestamp_seconds(F.col("id") % 86400).alias(
                "block_timestamp"
            ),
            (F.col("id") / 100).cast("long").alias("block_number"),
            topics.alias("topics_arr"),
            unhex_0x(data).alias("unhex_data"),
            sel.alias("selector"),
            hash_bucket(sel).alias("selector_hash"),
        )

    def _synth_traces(mult: int) -> DataFrame:
        sel_t = TRANSFER_FUNCTION.function_selector()
        is_t = (F.col("id") % 4) == 0
        noise = F.concat(
            F.lit("0x"),
            F.lpad(
                F.conv((F.col("id") % 8 + 1).cast("string"), 10, 16), 8, "0"
            ),
        )
        sel = F.when(is_t, F.lit(sel_t)).otherwise(noise)
        input_hex = F.concat(
            sel, _word(F.col("id") % 500), _word(F.col("id") % 100000)
        )
        return spark.range(100_000 * mult).select(
            F.concat(F.lit("0xtx"), F.col("id").cast("string")).alias(
                "transaction_hash"
            ),
            F.concat(F.lit("0x"), F.lpad(F.lit("ab"), 40, "a")).alias(
                "to_address"
            ),
            F.timestamp_seconds(F.col("id") % 86400).alias(
                "block_timestamp"
            ),
            (F.col("id") / 100).cast("long").alias("block_number"),
            F.lit("").alias("trace_address"),
            F.lit(1).alias("status"),
            unhex_0x(input_hex).alias("unhex_input"),
            unhex_0x(F.lit("0x" + "0" * 63 + "1")).alias("unhex_output"),
            sel.alias("selector"),
            hash_bucket(sel).alias("selector_hash"),
        )

    # snapshot-sync tick (r10 verdict task 6, carried to r12): a FIXED
    # worklist — 100 removed + 100 changed + 200 added, ABSOLUTE counts
    # (a daily delta does not scale with the corpus) — driving a
    # pre-built MinHash index from old→new snapshot at 1× and N×.
    # Three legs separate the documented cost model (operators/sync.py:
    # "O(|snapshot| join) for the diff + O(|changed set|) for the
    # writes + one compaction"):
    #   sync_diff_fixed_worklist   — the snapshot-diff join alone:
    #                                O(corpus), must track the scan;
    #   sync_writes_fixed_worklist — tombstone delete + batch append of
    #                                the worklist (no compact):
    #                                O(|worklist|), must stay ~FLAT as
    #                                the corpus grows — the claim that
    #                                makes sync cheaper than rebuild;
    #   sync_tick_fixed_worklist   — the full delete→compact→append
    #                                tick: the compaction physically
    #                                rewrites the index files (linear
    #                                in index bytes — the cost the
    #                                scheduled maintenance tick already
    #                                pays), so expected ≈linear and
    #                                NEVER super-linear.
    # The tick COMPACTS (mutates) its index, so every invocation —
    # including the harness warmup — pops a fresh pre-built copy from a
    # per-mult pool built outside the clock.
    def _sync_old(mult: int) -> DataFrame:
        return _scaled_docs(spark, args.sf, mult)

    def _sync_new(mult: int) -> DataFrame:
        base = spark.read.parquet(f"{args.sf}/documents.parquet")
        old = _sync_old(mult)
        # copy-0 ids [0,100) removed, [100,200) changed (copies sit at
        # +i·1M, far above 200, and stay untouched)
        keep = old.filter(F.col("doc_id") >= 200)
        changed = base.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
        ).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" synctickchanged")).alias("text"),
        )
        added = base.filter(F.col("doc_id") < 200).select(
            (F.col("doc_id") + F.lit(950_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" synctickadded")).alias("text"),
        )
        return keep.unionByName(changed).unionByName(added)

    sync_pool: dict[int, list[str]] = {}
    sync_writes_idx: dict[int, str] = {}
    if wanted("sync_tick_fixed_worklist"):
        # 1 warmup (always at mult=1) + 2 timed runs per mult
        for mult, n_copies in sorted({1: 3, args.factor: 2}.items()):
            if mult == 1:
                n_copies = 3 if args.factor != 1 else 5
            sync_pool[mult] = []
            for i in range(n_copies):
                p = os.path.join(idx_root, f"synctick_{mult}_{i}")
                dedup.write_minhash_index(_sync_old(mult), p)
                sync_pool[mult].append(p)
    if wanted("sync_writes_fixed_worklist"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"syncwrites_{mult}")
            dedup.write_minhash_index(_sync_old(mult), p)
            sync_writes_idx[mult] = p
    _sync_seq = iter(range(10_000))
    sync_worklist_ids = (
        spark.range(0, 200)
        .select(F.col("id").alias("doc_id"))
        .localCheckpoint()
    )
    sync_added_rows = None
    if wanted("sync_writes_fixed_worklist"):
        sync_added_rows = (
            spark.read.parquet(f"{args.sf}/documents.parquet")
            .filter(F.col("doc_id") < 200)
            .select(
                (F.col("doc_id") + F.lit(950_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" synctickadded")).alias(
                    "text"
                ),
            )
            .localCheckpoint()
        )

    def _run_sync_tick(mult: int) -> DataFrame:
        # eager by construction (the sync driver collects its report);
        # fresh index copy per invocation — see pool note above
        from datawaves_etl_airflow_spark.operators.sync import (
            sync_minhash_index_to_snapshot,
        )

        path = sync_pool[mult].pop()
        sync_minhash_index_to_snapshot(
            _sync_old(mult), _sync_new(mult), path,
            sync_token=f"sc{next(_sync_seq)}",
        )
        return spark.range(1)

    def _run_sync_writes(mult: int) -> DataFrame:
        # the two O(|worklist|) legs only: tombstone-delete 200
        # existing ids, append the 200 added-only rows (new ids — no
        # re-add, so the compact the RE-ADD contract requires between
        # delete and re-append is legitimately absent). Unique tokens
        # per run (a same-token retry replays as a no-op and would
        # time nothing); the accreted tombstone/batch dirs from prior
        # runs are worklist-sized, not corpus-sized.
        n = next(_sync_seq)
        dedup.delete_from_minhash_index(
            sync_worklist_ids, sync_writes_idx[mult],
            delete_token=f"scw{n}-del",
        )
        dedup.append_minhash_index(
            sync_added_rows, sync_writes_idx[mult],
            batch_token=f"scw{n}-add",
        )
        return spark.range(1)

    # persisted selector_hash-partitioned warehouse layout, built
    # OUTSIDE the clock: the measured claim is that a decode over the
    # layout READS only the selector's bucket (SURVEY.md §4) — scan
    # bytes ∝ matching bucket, not corpus
    logs_by_mult: dict[int, str] = {}
    if wanted("evt_decode_bucket_pruned"):
        for mult in sorted({1, args.factor}):
            p = os.path.join(idx_root, f"declogs{mult}")
            _synth_logs(mult).write.partitionBy("selector_hash").parquet(p)
            logs_by_mult[mult] = p

    #: covers the 10 heaviest BENCH_r03 queries' operator cores
    ops = {
        "evt_decode_inplan": lambda mult: dec.decode_log_events(
            _synth_logs(mult), TRANSFER_EVENT
        ),
        "evt_decode_bucket_pruned": lambda mult: dec.decode_log_events(
            spark.read.parquet(logs_by_mult[mult]), TRANSFER_EVENT
        ),
        "call_decode_inplan": lambda mult: dec.decode_call_functions(
            _synth_traces(mult), TRANSFER_FUNCTION
        ),
        "incremental_probe_fixed_batch": lambda mult: (
            dedup.dedup_against_index(
                probe_batch, idx_by_mult[mult], threshold=0.5
            )
        ),
        "bm25_probe_pruned": lambda mult: text.bm25_search_index(
            bm25_queries, bm25_by_mult[mult], k=10
        ),
        # the production operating point: the max_df_ratio stopword
        # valve drops stopword-grade query terms (the driver corpus has
        # several at df ratio ~0.8), so the probe skips exactly the
        # postings that made bm25_probe_pruned's residual super-linear.
        # Score contract: valved rankings cover the informative terms
        # only (operators/valves.py) — pinned vs the in-session form in
        # test_valves_production.TestBm25MaxDfRatio.
        "bm25_probe_pruned_valved": lambda mult: text.bm25_search_index(
            bm25_queries, bm25_by_mult[mult], k=10,
            max_df_ratio=valves.recommended("bm25_topk", "max_df_ratio"),
        ),
        # hard-negative mining (r11): FIXED judged query set against
        # a growing indexed corpus — retrieval is the bm25_probe_pruned
        # shape, the positives anti-join is judgment-bounded, so the
        # ratio must track bm25_probe_pruned's
        "hard_negatives_probe_pruned": lambda mult: (
            text.mine_hard_negatives_index(
                bm25_queries,
                spark.read.parquet(f"{args.sf}/documents.parquet")
                .limit(50)
                .select(
                    (F.col("doc_id") % 5).alias("query_id"),
                    "doc_id",
                    F.lit(1).alias("rel"),
                ),
                bm25_by_mult[mult],
                n_negatives=5,
                depth=10,
            )
        ),
        # the valved production posture (r12: mine_hard_negatives'
        # registry entry) — drops stopword-grade query terms' postings,
        # which is exactly the unvalved form's super-linear residual
        "hard_negatives_probe_pruned_valved": lambda mult: (
            text.mine_hard_negatives_index(
                bm25_queries,
                spark.read.parquet(f"{args.sf}/documents.parquet")
                .limit(50)
                .select(
                    (F.col("doc_id") % 5).alias("query_id"),
                    "doc_id",
                    F.lit(1).alias("rel"),
                ),
                bm25_by_mult[mult],
                n_negatives=5,
                depth=10,
                max_df_ratio=valves.recommended(
                    "mine_hard_negatives", "max_df_ratio"
                ),
            )
        ),
        "prf_probe_pruned": lambda mult: text.bm25_prf_search_index(
            bm25_queries, bm25f_by_mult[mult], k=10, fb_docs=3,
            fb_terms=5,
        ),
        "ann_probe_pruned": lambda mult: similarity.ivf_search_index(
            ann_queries, ivf_by_mult[mult], nprobe=4, k=5
        ),
        "ann_probe_deleted": lambda mult: similarity.ivf_search_index(
            ann_queries, ivfdel_by_mult[mult], nprobe=4, k=5
        ),
        "decontaminate_probe_pruned": lambda mult: (
            similarity.semantic_decontaminate_index(
                decon_bench, ivf_by_mult[mult], threshold=0.95, nprobe=4
            )
        ),
        "ann_probe_pruned_int8": lambda mult: similarity.ivf_search_index(
            ann_queries, ivf8_by_mult[mult], nprobe=4, k=5
        ),
        "ann_probe_pruned_pq": lambda mult: similarity.ivf_search_index(
            ann_queries, ivfpq_by_mult[mult], nprobe=4, k=5
        ),
        "ann_fullscan_baseline": lambda mult: similarity.brute_force_topk(
            _scaled_embs(spark, args.sf, mult), ann_queries, k=5
        ),
        "stream_semantic_fixed_batch": lambda mult: _run_sem_ingest(
            mult, "raw"
        ),
        "stream_semantic_fixed_batch_int8": lambda mult: _run_sem_ingest(
            mult, "int8"
        ),
        # SemDeDup operating regime: n_centroids scales WITH the corpus
        # so cell size stays fixed and sum(cell^2) — the pair stage —
        # grows linearly in n; a flat-k run would grow quadratically by
        # construction and measure the config error, not the plan.
        # Valve ON at the recommended production cap (operators.valves)
        # — the measured posture is the one a 100 TB pipeline runs.
        "semantic_dedup": lambda mult: similarity.semantic_dedup(
            _scaled_embs(spark, args.sf, mult),
            n_centroids=16 * mult,
            threshold=0.95,
            n_iters=1,
            max_cell_size=valves.recommended(
                "semantic_dedup", "max_cell_size"
            ),
        ),
        # the same regime through the two-level quantizer: balanced
        # levels of ~sqrt(k) each (16 = 4x4, 1600 = 40x40), so
        # per-row assignment work grows with sqrt(k) instead of k —
        # the flat row above pays 1600 dots/row at 100x, this one 80
        "semantic_dedup_2level": lambda mult: (
            lambda cf: similarity.semantic_dedup(
                _scaled_embs(spark, args.sf, mult),
                n_centroids=16 * mult,
                threshold=0.95,
                centroids=cf[1],
                coarse_centroids=cf[0],
                max_cell_size=valves.recommended(
                    "semantic_dedup", "max_cell_size"
                ),
            )
        )(
            similarity.train_centroids_2level(
                _scaled_embs(spark, args.sf, mult),
                n_coarse=4 * int(round(math.sqrt(mult))),
                n_fine=4 * int(round(math.sqrt(mult))),
                n_iters=1,
            )
        ),
        # prototype-distance gate: fixed centroid set broadcast against
        # a growing corpus — pure map-side argmax, must track the scan
        "cell_outliers": lambda mult: similarity.cell_outliers(
            _scaled_embs(spark, args.sf, mult),
            spark.read.parquet(f"{args.sf}/embeddings.parquet")
            .filter("vec_id < 16")
            .selectExpr(
                "vec_id AS centroid_id", "embedding AS centroid"
            ),
            min_sim=0.12,
        ),
        # the three sync-tick legs (setup + cost model above)
        "sync_diff_fixed_worklist": lambda mult: profile.snapshot_diff(
            _sync_old(mult), _sync_new(mult),
            id_col="doc_id", compare_cols=["text"],
        ).filter(F.col("status") != F.lit("unchanged")),
        "sync_writes_fixed_worklist": _run_sync_writes,
        "sync_tick_fixed_worklist": _run_sync_tick,
        "q1_agg": lambda mult: q1(_scaled_lineitem(spark, args.sf, mult)),
        "j1_3way_join": j1,
        "j5_factfact_join": lambda mult: j5(
            _scaled_lineitem(spark, args.sf, mult)
        ),
        # the EXACT twin of minhash_pairs (r11): prefix-filtered
        # all-pairs at the same threshold — candidate volume is
        # Σ prefix_df², kept comparable by the rarest-first ordering;
        # head-to-head with the banded row measures what exactness
        # costs at this threshold
        "jaccard_prefix_exact": lambda mult: dedup.jaccard_join_prefix(
            _scaled_docs(spark, args.sf, mult), threshold=0.5,
        ),
        # the operator's DESIGN point: at t=0.9 prefixes shrink to
        # ~0.1·|doc|+1 rarest tokens, which is where exact beats
        # banded LSH (which would need many more bands up there)
        "jaccard_prefix_exact_hi": lambda mult: dedup.jaccard_join_prefix(
            _scaled_docs(spark, args.sf, mult), threshold=0.9,
        ),
        "minhash_pairs": lambda mult: dedup.minhash_dedup_pairs(
            _scaled_docs(spark, args.sf, mult),
            threshold=0.5, n_hashes=64, n_bands=32,
        ),
        "dedup_clusters": lambda mult: dedup.duplicate_clusters(
            dedup.minhash_dedup_pairs(
                _scaled_docs(spark, args.sf, mult),
                threshold=0.5, n_hashes=64, n_bands=32,
            )
        ),
        "simhash_candidates": lambda mult: dedup.simhash_candidate_pairs(
            dedup.simhash_signatures(_scaled_docs(spark, args.sf, mult))
        ),
        "decontaminate": lambda mult: dedup.benchmark_contamination(
            _scaled_docs(spark, args.sf, mult),
            # fixed-size benchmark: decontamination probes scale by
            # corpus growth only
            spark.read.parquet(f"{args.sf}/documents.parquet").limit(300),
        ),
        # valve ON at the production cap, same rationale as
        # semantic_dedup above. The LSH OPERATING POINT scales with the
        # corpus exactly as semantic_dedup's n_centroids does: band_bits
        # grows with log2(mult) so expected bucket occupancy (and with
        # it Σ bucket², the candidate volume) stays constant per row,
        # and n_bands doubles to hold the S-curve recall at the 0.95
        # threshold (12 bits/16 bands miss ~0.6%; 19 bits/32 bands at
        # 100× miss ~1.1%). A flat-12-bit run at 100× rows packs ~500
        # docs into every band bucket and measures that quadratic
        # config error, not the plan — same reasoning as the scaled-k
        # note above.
        "neardup_banded": lambda mult: similarity.neardup_pairs_banded(
            _scaled_embs(spark, args.sf, mult),
            dim=64,
            threshold=0.95,
            n_bands=16 if mult == 1 else 32,
            band_bits=12 + int(round(math.log2(mult))),
            max_docs_per_band=valves.recommended(
                "neardup_pairs_banded", "max_docs_per_band"
            ),
        ),
        # cross-source contamination matrix (r11): sources stay fixed
        # as the corpus grows (how real mixtures grow) — the per-doc
        # shingling is the map-side scan, the (source, shingle)
        # distinct partial-aggregates map-side onto a near-saturating
        # type set, and pair volume is bounded by sources^2 per
        # shingle — the ratio must track the scan, never pairs
        "source_overlap": lambda mult: dedup.source_overlap(
            _scaled_docs_with_source(spark, args.sf, mult)
        ),
        "exact_dedup": lambda mult: dedup.exact_dedup_groups(
            _scaled_docs(spark, args.sf, mult)
        ),
        # bigram LM scoring (r11): counts + per-doc scoring joins —
        # token-keyed aggregates over the explode, expected ≈linear
        "bigram_logprob": lambda mult: text.bigram_logprob(
            _scaled_docs(spark, args.sf, mult)
        ),
        # Gopher repetition (r12): nine gram explodes into (id, n,
        # gram) hash aggregates — per-document keys only, partial
        # aggregation map-side; must track the scan
        "gopher_repetition": lambda mult: text.gopher_repetition_flags(
            _scaled_docs(spark, args.sf, mult)
        ),
        # C4 line clean (r12): map-side line filters + ONE line-keyed
        # global dedup aggregate + id-keyed reassembly. Perturbed
        # copies keep each doc's lines distinct (the copytoken suffix
        # lands in the final line), while the corpus's natural
        # repeated 12-word spans still dedup — realistic selectivity.
        "c4_clean": lambda mult: (
            lambda d: text.c4_clean(
                d.select(
                    "doc_id",
                    F.concat_ws(
                        "\n",
                        F.concat(
                            F.array_join(
                                F.slice(dedup.tokenize(F.col("text")), 1, 12),
                                " ",
                            ),
                            F.lit("."),
                        ),
                        F.lit("the shared boilerplate line repeats everywhere."),
                        F.concat(
                            F.array_join(
                                F.slice(dedup.tokenize(F.col("text")), 13, 12),
                                " ",
                            ),
                            F.lit("."),
                        ),
                    ).alias("text"),
                )
            )
        )(_scaled_docs(spark, args.sf, mult)),
        # BPE encode (r12): the framed literal-replace chain — one
        # map-side projection (8 iterative rules, expression tier),
        # zero shuffles before the histogram; must track the scan
        "bpe_encode": lambda mult: (
            lambda enc: enc.select(
                F.explode("tokens").alias("t")
            ).groupBy("t").count()
        )(
            text.bpe_encode(
                _scaled_docs(spark, args.sf, mult),
                [("t", "h"), ("th", "e"), ("s", "c"), ("sc", "a"),
                 ("sca", "n"), ("e", "r"), ("t", "a"), ("ta", "b")],
            )
        ),
        "text_quality": lambda mult: text.quality_logit(
            _scaled_docs(spark, args.sf, mult)
        ),
        # quality-classifier TRAINING (r13): the stats head — each of
        # the 10 epochs is ONE 6-float aggregate over the cached
        # standardized projection, so the whole run must track the
        # scan. Labels derived in-plan; training runs eagerly inside
        # the build, the returned scoring plan is what's timed on top
        "train_quality": lambda mult: (
            lambda d: (
                lambda lab: text.quality_logit(
                    lab,
                    weights=text.train_quality_classifier(
                        lab, n_epochs=5
                    ),
                )
            )(
                d.withColumn(
                    "label",
                    (F.length("text") >= 200).cast("int"),
                ).filter(F.length("text") > 0)
            )
        )(_scaled_docs(spark, args.sf, mult)),
        # the hashed-n-gram sibling: per epoch one doc-keyed logit
        # aggregate + one fid-keyed gradient aggregate (both partial-
        # agg-friendly), weights stay a distributed (fid, weight)
        # relation — must track the scan, never dim
        "train_hashed": lambda mult: (
            lambda d: (
                lambda lab: (
                    lambda wb: text.hashed_ngram_logit(
                        lab, wb[0], wb[1], dim=4096
                    )
                )(
                    text.train_hashed_ngram_classifier(
                        lab, dim=4096, n_epochs=3
                    )
                )
            )(
                d.withColumn(
                    "label",
                    (F.length("text") >= 200).cast("int"),
                ).filter(F.length("text") > 0)
            )
        )(_scaled_docs(spark, args.sf, mult)),
        # unigram-LM tokenizer (r13): training cost scales with
        # DISTINCT words (the E step segments each distinct word once
        # per iteration; corpus size enters only through the word-
        # count aggregate), segmentation with corpus rows — the
        # ratio must sit between flat and the scan
        "unigram_train_segment": lambda mult: (
            lambda d: text.unigram_segment(
                d,
                text.train_unigram_lm(
                    d, vocab_size=64, seed_size=256, n_iters=1
                ),
            )
        )(_scaled_docs(spark, args.sf, mult)),
        # the winnowing MAP stage (k-gram hash + window minima): the
        # pair join is measured separately by its max_docs_per_fp bound
        # (test-pinned) because perturbed COPIES share whole-document
        # runs — pair volume on this synthetic corpus grows by
        # construction, not by data, and would mismeasure the operator
        "winnow_fingerprints": lambda mult: dedup.winnow_fingerprints(
            _scaled_docs(spark, args.sf, mult)
        ),
        # ExactSubstr dedup (r13), both tiers. Copies get a per-copy
        # token spliced EVERY 8 WORDS so no ≥10-word run spans copies
        # (the plain copytoken suffix would duplicate whole documents
        # across copies and grow pair volume quadratically by
        # construction); duplication left is the corpus's own aligned
        # runs — the anchors tier's fp self-join must stay banded
        # (ratio ≈ scan), the grams tier is the documented ×L brute
        # (linear with a bigger constant)
        # valved at the production operating point (valves.py) — the
        # measured 100 TB posture is the valved one, per the family
        # convention; in-code default is None (exact)
        "exact_substr_anchors": lambda mult: dedup.exact_substring_dedup(
            _scaled_docs_broken_runs(spark, args.sf, mult),
            min_run_words=10,
            method="anchors",
            max_sites_per_anchor=int(
                valves.recommended(
                    "exact_substring_dedup", "max_sites_per_anchor"
                )
            ),
        ),
        "exact_substr_grams": lambda mult: dedup.exact_substring_dedup(
            _scaled_docs_broken_runs(spark, args.sf, mult),
            min_run_words=10,
        ),
        # the g2 scale guard (round-6 verdict #6): grouped quantiles on
        # the SKETCH path — per-group state O(accuracy) regardless of
        # group size, so the ratio must track the scan, never the
        # group-buffer blowup the exact percentile form risks
        "grouped_quantiles_sketch": lambda mult: profile.grouped_quantiles(
            _scaled_lineitem(spark, args.sf, mult),
            ["l_returnflag"],
            "l_quantity",
            mode="approx",
        ),
    }
    if selected is not None:
        unknown = selected - set(ops)
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        ops = {k: v for k, v in ops.items() if k in selected}

    def run(build, mult: int) -> float:
        # drop persisted intermediates (minhash sets) so every timed
        # execution pays the full plan, not a cache hit; time the BUILD
        # too — iterative ops (duplicate_clusters) execute eagerly at
        # build time and would otherwise escape the clock
        spark.catalog.clearCache()
        t0 = time.time()
        build(mult).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm the readers + python workers once
    for build in ops.values():
        build(1).limit(1).count()

    out = {}
    for name, build in ops.items():
        t1 = min(run(build, 1) for _ in range(2))
        tn = min(run(build, args.factor) for _ in range(2))
        # --factor 1 would collide the two keys and silently drop the
        # first timing; keep both measurements addressable
        tn_key = f"t{args.factor}" if args.factor != 1 else "t1_repeat"
        out[name] = {
            "t1": round(t1, 3),
            tn_key: round(tn, 3),
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps({"factor": args.factor, "sf": args.sf, "ops": out}))


if __name__ == "__main__":
    main()
