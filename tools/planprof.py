"""Plan + timing profiler for the optimization rounds (guide §1).

Usage:
    python tools/planprof.py plans [--out plans/r13 --suffix _before] [q ...]
        Dump .explain("formatted") for the bench queries (or the named
        subset) to <out>/<query><suffix>.txt.
    python tools/planprof.py time [--runs 3] [q ...]
        Min-of-N noop-sink timing per query (bench methodology:
        clearCache before each run, one untimed warm run), printed as
        one JSON line.

Separate from bench.py so the driver-contract bench stays byte-stable;
this tool is for the builder's own measure/optimize loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERY_NAMES, _warmup  # noqa: E402


def _load_queries():
    from datawaves_etl_airflow_spark.queries import domain, generic, llm

    mods = {"domain": domain, "generic": generic, "llm": llm}
    out = {q: getattr(mods[m], q) for m, q in BENCH_QUERY_NAMES}
    # non-bench corpus queries resolve too (plan evidence for the
    # optimization rounds covers the whole surface, not just the
    # headline list); bench names keep priority on collision
    for mod in mods.values():
        for name in dir(mod):
            if name not in out and (
                name.startswith("llm_") or name[:1].isalpha()
            ):
                fn = getattr(mod, name)
                if callable(fn) and getattr(fn, "__module__", "").endswith(
                    mod.__name__.split(".")[-1]
                ):
                    out[name] = fn
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["plans", "time"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from datawaves_etl_airflow_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "planprof", conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = _load_queries()
    # no names → the bench list (the non-bench resolutions include
    # helpers that are not (spark, sf_dir) queries; they are only
    # reachable by explicit name)
    names = args.names or [q for _m, q in BENCH_QUERY_NAMES]
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    if args.mode == "plans":
        os.makedirs(args.out, exist_ok=True)
        for name in names:
            spark.catalog.clearCache()
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.out, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        return

    _warmup(spark, sf_dir)
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"planprof:{name}")
        spark.catalog.clearCache()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3), "runs": args.runs}))


if __name__ == "__main__":
    main()
