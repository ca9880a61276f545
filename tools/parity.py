"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB (same parquet tables registered as views), then compares row
count, sorted column names, and an order-insensitive value hash —
approximating CORRECTNESS_r{N}.json so mismatches surface before the
driver runs.

Usage: python tools/parity.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import hashlib
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: driver-hash-stable means bit-equal
    if isinstance(v, decimal.Decimal):
        # deliberately NOT str(v): the driver's DuckDB pandas fetch turns
        # DECIMAL into float64, so a Decimal anywhere in a compared
        # projection is a hash mismatch waiting to happen. Tag it so
        # parity FAILS loudly instead of normalizing it away.
        return f"\x02DECIMAL:{v}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _from_pandas(v):
    """Pandas cell → plain Python, mirroring what a driver comparing a
    DuckDB ``fetchdf()`` frame would see (NaT/NaN = NULL, numpy scalars
    unwrapped, list columns as numpy arrays → lists)."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None  # DuckDB NULL in a numeric column surfaces as NaN
    if isinstance(v, np.generic):
        return _from_pandas(v.item())
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.ndarray):
        return [_from_pandas(x) for x in v.tolist()]
    return v


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--registered",
        action="store_true",
        help="only the driver-registered subset, in driver order",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from datawaves_etl_airflow_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    # the FULL corpus (registered + budget-trimmed variants); pass
    # --registered to check exactly what the driver will run
    if args.registered:
        queries = entrymod.queries()
        oracles = entrymod.oracle_sql()
    else:
        queries = entrymod.queries_all()
        oracles = entrymod.oracle_sql_all()
    names = args.names or list(queries)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            # pandas fetch, NOT fetchall(): replicates the driver's
            # comparison path, where DECIMAL and HUGEINT (int128)
            # silently become float64 — the exact coercion that made 20
            # value-identical queries hash-fail in round 2.
            odf = res.fetchdf()
            # DATE columns come back as midnight datetime64 in pandas;
            # the driver matches them against Spark dates (r02: s2 and
            # d_prices_fill hash-matched), so fold them back to dates
            date_cols = {
                d[0]
                for d in res.description
                if str(d[1]).upper() in ("DATE",)
            }
            orows = [
                tuple(
                    v.date()
                    if ocols[i] in date_cols and isinstance(v, dt.datetime)
                    else v
                    for i, v in enumerate(
                        _from_pandas(x)
                        for x in row
                    )
                )
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value-hash {sh} vs {oh}")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("\x01".join(_norm(r[i]) for i in order_s) for r in srows)
                oset = sorted("\x01".join(_norm(r[i]) for i in order_o) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        problems.append(f"  first diff:\n   spark: {a!r}\n   duck : {b!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
