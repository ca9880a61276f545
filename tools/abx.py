"""Interleaved A/B for ARBITRARY corpus queries (non-bench names).

``bench.py --ab`` covers the 30 headline queries; optimization work on
the wider corpus (e2e compositions, BM25 family, training ops) needs
the same drift-cancelling protocol. Reuses bench's ``_World`` module
swap: one JVM, alternating snapshot/HEAD samples, min-of-N pairs.

Usage:
    python tools/abx.py <git-ref> [--runs 3] name [name ...]

Names are resolved in ``queries.llm`` / ``queries.generic`` /
``queries.domain`` (first hit wins). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _PKG, _warmup, _World  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wt = tempfile.mkdtemp(prefix="abx_")
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", wt, args.ref],
        check=True,
        capture_output=True,
    )
    try:
        from datawaves_etl_airflow_spark.session import get_spark

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        spark = get_spark(
            "abx", conf={"spark.ui.showConsoleProgress": "false"}
        )
        spark.sparkContext.setLogLevel("ERROR")
        _warmup(spark, sf_dir)

        head = _World(repo)
        snap = _World(wt)
        head.activate()
        head.deactivate()
        snap.activate()
        snap.deactivate()

        def _resolve(qname: str):
            for m in ("llm", "generic", "domain"):
                mod = sys.modules.get(f"{_PKG}.queries.{m}")
                fn = getattr(mod, qname, None) if mod else None
                if fn is not None:
                    return fn
            raise SystemExit(f"unknown query: {qname}")

        def _sample(world: _World, qname: str) -> float:
            world.activate()
            try:
                fn = _resolve(qname)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"abx:{qname}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.time() - t0
            finally:
                spark.sparkContext.setJobDescription(None)
                world.deactivate()

        results: dict[str, dict] = {}
        for qname in args.names:
            _sample(snap, qname)
            _sample(head, qname)
            st, ht = [], []
            for _ in range(args.runs):
                st.append(_sample(snap, qname))
                ht.append(_sample(head, qname))
            s, h = min(st), min(ht)
            results[qname] = {
                "snap": round(s, 3),
                "head": round(h, 3),
                "ratio": round(h / s, 3) if s > 0 else None,
            }
        print(
            json.dumps(
                {
                    "metric": "abx_interleaved",
                    "ref": args.ref,
                    "queries": results,
                    "timing": f"interleaved min-of-{args.runs} pairs, "
                    "cache cleared per sample, one JVM",
                }
            )
        )
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    main()
