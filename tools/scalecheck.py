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


def _scaled_embs(spark, sf_dir: str, factor: int) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = [
        e.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, j: F.when(
                    j == 0, x.cast("double") * F.lit(1.0 + 0.37 * i)
                ).otherwise(x.cast("double")),
            ).alias("embedding"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from datawaves_etl_airflow_spark.operators import dedup, similarity
    from datawaves_etl_airflow_spark.session import get_spark

    spark = get_spark(
        "scalecheck", conf={"spark.ui.showConsoleProgress": "false"}
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

    ops = {
        "q1_agg": lambda mult: q1(_scaled_lineitem(spark, args.sf, mult)),
        "j5_factfact_join": lambda mult: j5(
            _scaled_lineitem(spark, args.sf, mult)
        ),
        "minhash_pairs": lambda mult: dedup.minhash_dedup_pairs(
            _scaled_docs(spark, args.sf, mult),
            threshold=0.5, n_hashes=64, n_bands=32,
        ),
        "neardup_banded": lambda mult: similarity.neardup_pairs_banded(
            _scaled_embs(spark, args.sf, mult), dim=64, threshold=0.95
        ),
        "exact_dedup": lambda mult: dedup.exact_dedup_groups(
            _scaled_docs(spark, args.sf, mult)
        ),
    }

    def run(df: DataFrame) -> float:
        # drop persisted intermediates (minhash sets) so every timed
        # execution pays the full plan, not a cache hit
        spark.catalog.clearCache()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm the readers + python workers once
    for build in ops.values():
        build(1).limit(1).count()

    out = {}
    for name, build in ops.items():
        t1 = min(run(build(1)) for _ in range(2))
        tn = min(run(build(args.factor)) for _ in range(2))
        out[name] = {
            "t1": round(t1, 3),
            f"t{args.factor}": round(tn, 3),
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps({"factor": args.factor, "sf": args.sf, "ops": out}))


if __name__ == "__main__":
    main()
