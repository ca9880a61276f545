"""Generic relational query corpus over the driver's TPC-H-ish tables.

Each query exercises one operator family from SURVEY.md §2 (noted per
function) on the pre-registered tables ``region nation customer supplier
part orders lineitem events`` so the driver's DuckDB oracle can verify
it. Domain-specific (blockchain) twins live in ``queries.domain``.

Determinism rules shared with the oracles:
- money aggregates go through exact integer cents — ``floor(x*100)``
  is bit-identical in both engines (IEEE multiply + floor), integer
  sums are order-independent, and the final ``sum_cents/100.0`` is one
  bigint→double conversion (exact below 2⁵³) plus one IEEE division —
  identical bits in both engines. (Per-term ``round(x, 2)`` is NOT
  safe: Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds
  the binary value half-away — they disagree on values like
  123.45499999999...)
- compared projections emit only driver-hash-stable types: BIGINT /
  DOUBLE / VARCHAR / TIMESTAMP / DATE / BOOLEAN. Never DECIMAL — the
  driver's DuckDB→pandas fetch coerces DECIMAL and HUGEINT (int128)
  to float64, so a Spark ``Decimal('108375.00')`` hash-mismatches the
  oracle's ``108375.0`` even when values are identical. DuckDB integer
  SUMs (plain and windowed) return HUGEINT and need an explicit
  ``CAST(... AS BIGINT)``.
- every LIMIT/top-k has a total tiebreak order.
- double→int conversions go through floor() (Spark casts truncate,
  DuckDB casts round — floor first makes both exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLES"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores nanosecond parquet timestamps, which
    Spark's vectorized reader rejects; read them as long and convert
    (DuckDB truncates ns→µs the same way)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # newer readers surface ns timestamps as NTZ directly; with the
        # session tz pinned to UTC this cast is a pure reinterpretation,
        # and it keeps unix_micros()/unix_timestamp() working
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _cents(col: Column) -> Column:
    return F.floor(col * F.lit(100.0)).cast("bigint")


def _sum_money(col: Column) -> Column:
    """Order-independent exact money sum → DOUBLE (hash-stable; the
    bigint cents sum converts exactly and /100.0 is one IEEE op)."""
    return (F.sum(_cents(col)) / F.lit(100.0)).cast("double")


# --------------------------------------------------------------------------
# Aggregations (A-1/A-2 analogs + the table-stakes GROUP BY the reference
# lacks but an analytics engine needs, SURVEY.md §2.4-2.5)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter + groupBy + 4 aggregates.

    Partial (map-side) aggregation + a single shuffle on the 6-value
    group key; the shipdate filter is pushed to the parquet scan.
    """
    l = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") < F.lit("1997-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_money(F.col("l_quantity")).alias("sum_qty"),
            _sum_money(F.col("l_extendedprice")).alias("sum_base_price"),
            _sum_money(disc).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def a1_count_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-1: scalar count(1) existence check over a date filter
    (reference: dags/resources/verify/blocks_have_latest.sql)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def a2_count_col_vs_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-2: null-skipping count(col) vs count(*) in one aggregate
    (reference: traces_null_address_equal_to_transaction_count.sql)."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.count(F.nullif(F.col("event_type"), F.lit("error"))).alias("cnt_col"),
        F.count(F.lit(1)).alias("cnt_star"),
    )


def g1_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregate (engine extension beyond the
    reference's agg surface, SURVEY.md §2.4)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _sum_money(F.col("l_quantity")).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Joins (J-1..J-7 analogs on the generic star schema)
# --------------------------------------------------------------------------

def j1_order_revenue_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-1 analog: fact ⋈ fact-agg ⋈ broadcast dimension (3-way inner
    equi-join, reference evm_load_template.py:408-412). The customer
    dimension is explicitly broadcast — the two fact sides never
    shuffle it."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        l.groupBy("l_orderkey")
        .agg(
            _sum_money(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    dim = F.broadcast(
        c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_name")
    )
    return (
        o.join(rev, o["o_orderkey"] == rev["l_orderkey"], "inner")
        .join(dim, o["o_custkey"] == dim["c_custkey"], "inner")
        .select("o_orderkey", "o_orderdate", "c_name", "revenue")
    )


def j5_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-5 analog: multi-column equi-join — lineitem back-joined to a
    (partkey, suppkey) aggregate on the composite key (reference
    evm_load_template.py:370-375 recovers tx hash the same way)."""
    l = _t(spark, sf_dir, "lineitem")
    pairs = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("pair_lines"))
        .filter(F.col("pair_lines") >= 3)
    )
    return (
        l.join(pairs, ["l_partkey", "l_suppkey"], "inner")
        .groupBy("l_partkey", "l_suppkey", "pair_lines")
        .agg(_sum_money(F.col("l_quantity")).alias("sum_qty"))
    )


#: j6-family warehouse cutoff: every customer has SOME order in the
#: test data, so the warehouse side is "orders before the cutoff" —
#: keeping the anti-join result non-vacuous (≈55% of customers at
#: sf0.01) so the oracle verifies values, not just an empty set.
_J6_CUTOFF = "1995-06-01"


def _early_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(_J6_CUTOFF).cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )


def j6_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-6: left-anti join — customers with no early order (the
    reference's IN/EXCEPT tokens dedup, evm_load_template.py:290-295)."""
    c = _t(spark, sf_dir, "customer")
    return c.join(
        _early_orders(spark, sf_dir), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def j6b_anti_join_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-6 scale variant: same anti-join through
    `anti_join_prefiltered` — broadcast-semi warehouse reduction, the
    big side never shuffles. Same oracle relation as j6."""
    from ..operators.enrich import anti_join_prefiltered

    c = _t(spark, sf_dir, "customer")
    out = anti_join_prefiltered(c, _early_orders(spark, sf_dir), "c_custkey")
    return out.select("c_custkey", "c_name")


def j6c_anti_join_bucket_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-6 layout variant: the warehouse (orders custkeys) is staged in
    a `write_key_bucketed` hive layout, and the anti-join reads only
    the `key_bucket=` directories the staged batch hashes into —
    pruning the warehouse scan itself. Same oracle relation as j6/j6b
    (the layout is a physical re-arrangement, not a new relation)."""
    import os

    from ..operators.enrich import anti_join_bucket_pruned
    from ..operators.sinks import write_key_bucketed

    path = os.path.join(
        os.environ.get("SPARK_GRAFT_FIXTURES", "/root/repo/.fixtures"),
        "bucketed",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "orders_by_custkey",
    )
    o = _early_orders(spark, sf_dir)
    write_key_bucketed(o, path, "c_custkey", n_buckets=16)
    c = _t(spark, sf_dir, "customer")
    out = anti_join_bucket_pruned(c, path, "c_custkey", n_buckets=16)
    return out.select("c_custkey", "c_name")


def h2_range_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered layout (sinks.write_range_clustered): orders
    re-laid-out by o_orderdate so a one-month window scan skips every
    non-overlapping file via parquet min/max stats; the relation is a
    plain window aggregate, identical to the oracle over the original
    table (the layout is physical only)."""
    import os

    from ..operators.sinks import write_range_clustered

    path = os.path.join(
        os.environ.get("SPARK_GRAFT_FIXTURES", "/root/repo/.fixtures"),
        "clustered",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "orders_by_date",
    )
    write_range_clustered(
        _t(spark, sf_dir, "orders"), path, "o_orderdate", 16
    )
    o = spark.read.parquet(path).filter(
        (F.col("o_orderdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _sum_money(F.col("o_totalprice")).alias("sum_price"),
    )


def j7_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-7 analog: two broadcast dimension joins then aggregate."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"], "inner")
        .join(r, n["n_regionkey"] == r["r_regionkey"], "inner")
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _sum_money(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


def e1_except_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-1: EXCEPT (distinct) set-op — parts never ordered
    (reference evm_load_template.py:292-294 uses the same shape)."""
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    l = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    return p.exceptAll(l.distinct()).distinct()


# --------------------------------------------------------------------------
# Projections / filters (P-1..P-5 analogs) and the §2.6 scalar surface
# --------------------------------------------------------------------------

def p4_date_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P-4: date filter + narrow projection; both the predicate and the
    3-column ReadSchema reach the parquet scan."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-03-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def p5_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P-5: conjunctive predicate with a null test
    (reference: trace_address = '[]' AND transaction_hash IS NOT NULL)."""
    e = _events(spark, sf_dir)
    return e.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") > 100.0)
        & F.nullif(F.col("props"), F.lit("")).isNotNull()
    ).select("event_id", "user_id", "value")


def f_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 scalar-function surface in one projection: from_json-style
    extraction, substr, split, replace, if/case, floor-cast,
    timestamp_seconds (reference evm_load_template.py:217-237)."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.substring("event_type", 1, 3).alias("et3"),
        F.array_join(F.split("event_type", "i"), "|").alias("et_split"),
        F.regexp_replace("event_type", "c", "k").alias("et_replace"),
        F.when(F.col("value") > 50.0, F.lit("hi")).otherwise(F.lit("lo")).alias("band"),
        F.floor("value").cast("bigint").alias("value_floor"),
        F.timestamp_seconds(F.floor("value").cast("bigint")).alias("ts_derived"),
    )


def h1_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc bucketing + aggregate (time-series table stakes)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value")).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Windows / sort-limit / set ops (engine extensions, SURVEY.md §2.5)
# --------------------------------------------------------------------------

def w1_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: latest 3 events per user (total tiebreak order)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-frame window: cumulative purchase value per user."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        (F.sum(_cents(F.col("value"))).over(w) / F.lit(100.0)).cast("double").alias("running_value"),
    )


def w4_rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame window: per-customer rolling 7-day order total —
    the time-based frame (RANGE BETWEEN INTERVAL) that rows-based w2
    can't express; ties on the order key share one frame in both
    engines by RANGE semantics."""
    o = _t(spark, sf_dir, "orders")
    sec = F.unix_timestamp(F.col("o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(sec)
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(_cents(F.col("o_totalprice"))).over(w) / F.lit(100.0))
        .cast("double")
        .alias("rolling_7d"),
    )


def h3_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) time windows: 30-minute windows every 10
    minutes over events — each event lands in 3 windows
    (`F.window` with slide). Window key emitted as epoch seconds so
    both engines compare integers, not timezone-rendered timestamps."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "30 minutes", "10 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def x2_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: lineitems priced above the global mean.
    The comparison is pure integer (`cents × n > total_cents`) — no
    float average ever materializes, so the result is exact and
    order-independent; the 1-row aggregate broadcasts."""
    l = _t(spark, sf_dir, "lineitem")
    cents = _cents(F.col("l_extendedprice"))
    agg = l.agg(
        F.sum(cents).alias("_tot"), F.count(F.lit(1)).alias("_n")
    )
    return (
        l.crossJoin(F.broadcast(agg))
        .filter(cents * F.col("_n") > F.col("_tot"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def pv2_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): wide per-flag aggregates → long (flag, metric,
    value) — the inverse of pv1's pivot, exact integer-cents values."""
    l = _t(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(2, 'sum_qty', sum_qty,"
            " 'sum_price_cents', sum_price_cents)"
        ).alias("metric", "value"),
    )


def f2_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embeddings table:
    transform/aggregate fold for the squared L2 norm (left fold, same
    order both engines), size, and exact max element."""
    e = _t(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sq_norm, 6).alias("sq_norm"),
        F.array_max("embedding").cast("double").alias("max_elem"),
    )


def t1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with total order (sort + limit)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def u1_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set-op: users with both click and purchase events."""
    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys)


def sk1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated two-phase aggregation (operators.skew): same
    result as the plain groupBy, which the oracle verifies."""
    from ..operators.skew import salted_count_sum

    l = _t(spark, sf_dir, "lineitem")
    out = salted_count_sum(
        l, ["l_returnflag"], {"sum_qty_cents": _cents(F.col("l_quantity"))}
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        (F.col("sum_qty_cents") / F.lit(100.0)).cast("double").alias("sum_qty"),
    )


def w3_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after a >30 min
    silence per user (lag + running conditional sum). Exact integer
    microsecond arithmetic on both engines."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > F.lit(1800 * 1_000_000)), 1
    ).otherwise(0)
    return e.select(
        "user_id",
        "event_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )


def j8_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with ≥1 order over 450k.
    Complement of J-6's anti shape; same single shuffle on the key."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def j9_full_outer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-customer order count vs event count —
    customers with no events and users with no orders both survive."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cid"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        _events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("cid"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return o.join(e, "cid", "full_outer").select(
        "cid",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


def g3_cube_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderpriority, orderstatus): all 4 grouping-set
    combinations in one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _sum_money(F.col("o_totalprice")).alias("sum_price"),
    )


def pv1_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: returnflag rows × linestatus columns (explicit value
    list so the plan is single-pass, no distinct-scan)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_sum_money(F.col("l_quantity")))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
    )


def m1_upsert_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/SCD1 emulation without Delta: updates ∪ (current ⟂
    updates) — the anti-join+union upsert the reference's S-4 append
    generalizes to. Updates batch = every 10th customer with a bumped
    balance."""
    cur = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", _cents(F.col("c_acctbal")).alias("_cents")
    )
    updates = cur.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "_cents", F.col("_cents") + F.lit(10000)
    )
    kept = cur.join(updates, "c_custkey", "left_anti")
    return kept.unionByName(updates).select(
        "c_custkey",
        "c_name",
        (F.col("_cents") / F.lit(100.0)).cast("double").alias("acctbal"),
    )


def m2_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 upsert (operators.scd): an updates batch derived from
    March-1996 order counts closes and re-opens changed customer rows,
    preserving history; unchanged and untouched rows pass through."""
    from ..operators.scd import scd2_apply

    dim = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nation"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            (F.col("_n") % 25).cast("long").alias("nation"),
            F.lit("1996-04-01").cast("timestamp").alias("eff"),
        )
    )
    return scd2_apply(dim, upd, "c_custkey", ["nation"], "eff")


def g4_purchase_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of purchase value over time. No float sums:
    x is seconds since the user's first purchase (small ints), y is
    integer cents, and the slope comes from the closed form
    ``(n·Σxy − Σx·Σy) / (n·Σx² − Σx²)`` over exact BIGINT sums — the
    only float op is one final division, identical in any engine."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id")
    d = e.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.min(F.unix_timestamp("ts")).over(w)
        ).alias("x"),
        _cents(F.col("value")).alias("y"),
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.filter((F.col("n") >= 2) & (den > 0))
        .select(
            "user_id",
            "n",
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "slope_cents_per_sec"
            ),
        )
    )


def x1_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch tier: HLL++ distinct counts + approx quantiles per event
    type — the O(1)-memory aggregates a 100 TB profile pass uses
    instead of exact distinct/percentile. Self-checking: the sketches
    are implementation-defined, so the compared projection emits the
    EXACT values (count distinct, quartile bounds) plus booleans
    asserting the sketch landed within tolerance — the oracle computes
    the same exact values and asserts TRUE, making the sketch accuracy
    itself driver-verified instead of rows-only."""
    e = _events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
        F.percentile_approx("value", 0.5, 10000).alias("_am"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile("value", 0.25).alias("_q25"),
        F.percentile("value", 0.75).alias("_q75"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        "event_type",
        "n_rows",
        "exact_users",
        # HLL++ at rsd=0.02: a 10% band is ~5 sigma — deterministic pass
        (
            F.abs(F.col("_au") - F.col("exact_users"))
            <= F.ceil(F.col("exact_users") * 0.1)
        ).alias("approx_users_ok"),
        # approx median (an actual element at this accuracy) must land
        # inside the exact interquartile range
        ((F.col("_am") >= F.col("_q25")) & (F.col("_am") <= F.col("_q75"))).alias(
            "approx_median_ok"
        ),
    )


def aj1_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.temporal): for each purchase event, the
    latest click at-or-before it by the same user. Right side is
    pre-aggregated to unique (user_id, ts) so both engines' tie rule
    is moot; oracle is DuckDB's native ASOF LEFT JOIN."""
    from ..operators.temporal import asof_join

    e = _events(spark, sf_dir)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("value").alias("click_value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases, clicks, "user_id", "ts", "click_ts", ["click_value"]
    )


def aj2_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of relation as aj1, through the hot-key-safe bucketed
    variant (15-minute window partitions + carried seeds) — proving
    the scale path against the identical DuckDB ASOF oracle."""
    from ..operators.temporal import asof_join_bucketed

    e = _events(spark, sf_dir)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("value").alias("click_value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join_bucketed(
        purchases, clicks, "user_id", "ts", "click_ts", ["click_value"], 900
    )


def rj1_promo_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (operators.temporal): lineitems shipped
    inside each high-value order's 14-day promo window — a pure
    containment predicate, no equi key. The operator grids it into an
    equi-join on 4-day buckets + residual filter; the oracle is the
    raw inequality join."""
    from ..operators.temporal import bucketed_range_join

    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 495000.0
    ).select(
        "o_orderkey",
        (F.col("o_orderdate") - F.expr("INTERVAL 3 DAYS")).alias("promo_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 11 DAYS")).alias("promo_end"),
    )
    l = _t(spark, sf_dir, "lineitem").select("l_shipdate", "l_extendedprice")
    joined = bucketed_range_join(
        l, "l_shipdate", o, "promo_start", "promo_end", 4 * 86400
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipped"),
        _sum_money(F.col("l_extendedprice")).alias("sum_price"),
    )


def g2_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantiles via `operators.profile.grouped_quantiles` in
    EXACT mode: Spark's ``percentile`` (linear interpolation) vs DuckDB
    ``quantile_cont`` — same R-7 formula, and integer-valued quantities
    make every interpolated value exactly representable. Exact
    ``percentile`` buffers each group's values on its reducer, so this
    mode is only for bounded groups — the operator's ``approx`` /
    ``auto`` modes are the 100 TB path (GK sketch, O(accuracy) state
    per group, rank-error bound pinned in tests/test_profile.py)."""
    from ..operators.profile import grouped_quantiles

    l = _t(spark, sf_dir, "lineitem")
    q = grouped_quantiles(
        l, ["l_returnflag"], "l_quantity", [0.25, 0.5, 0.75], mode="exact"
    )
    return q.select(
        "l_returnflag",
        "n_rows",
        F.col("q_25").alias("q25"),
        F.col("q_50").alias("q50"),
        F.col("q_75").alias("q75"),
    )


#: Driver-registered subset in evaluation order (see
#: queries.domain.DRIVER_QUERIES for the budget rationale). Round-4
#: rotation: the 12 never-driver-verified generic queries lead
#: (rollup, 3-way and composite-key joins, range-clustered scan, time
#: bucketing, running/rolling windows, pivot/unpivot, upsert,
#: profiling, incremental merge), followed by the 10 r3-green family
#: sentinels that have no rotated twin. Everything else in QUERIES
#: remains parity/pytest-verified (plan shapes pinned in
#: tests/test_plans.py).
#: Round-5 rotation: the 19 r2-last-green queries (not re-verified
#: since the round-2 run) take every generic slot; the r4-green set
#: rotates out, parity-pinned.
#: Round-6 rotation: g2 leads (rewired through the new
#: operators.profile.grouped_quantiles scale guard this round), then
#: every other r4-last-green generic query — except aj1_asof_clicks,
#: deferred one round (its bucketed twin aj2 went green in r5; the
#: 50-slot budget needs exactly one deferral). The r5-green set
#: rotates out, parity-pinned.
#: Round-7 rotation: aj1_asof_clicks leads (last driver green r4 — the
#: one r6 deferral; no other query's green is older than r5), then the
#: r5-last-green generic cohort. aj2_asof_bucketed takes this round's
#: single 50-slot deferral (the mirror of r6's aj1 deferral: its
#: unbucketed twin aj1 holds a slot, both are parity-green, and the
#: as-of operator surface is unchanged); it leads the r8 rotation.
#: The r6-green set rotates out, parity-pinned.
#: Round-8 rotation: aj2_asof_bucketed leads (last green r5 — the r7
#: deferral), then 17 of the 21 r6-last-green generic queries. The
#: round's 54 freshness candidates (50 r6-green + 2 r5-stale + 2 new
#: surfaces) exceed the hard 50-slot budget by exactly 4, so four
#: r6-green queries defer one round — chosen as pure-SQL extension
#: queries whose operator surface is untouched this round and whose
#: same-family twin IS re-verified this round: w2_running_sum (twin
#: w4 in), pv2_unpivot_metrics (twin pv1 in), g3_cube_priority (twin
#: g1 in), h1_hourly_events (twins h2 in / h3 r7-green). All four
#: stay parity-green and lead the r9 rotation.
#: Round-9 rotation: the four r6-stale deferrals lead (w2/pv2/g3/h1 —
#: the documented r8 deferrals, each a pure-SQL extension query whose
#: operator surface is untouched since r6), then the r7-last-green
#: generic cohort. Seven r7-green queries defer one round to fund the
#: three never-verified llm heads + the four stale generics within the
#: hard 50-slot budget — a2, g4, h3, j6b, j9, p5, u1, each a pure-SQL
#: extension query with an UNtouched operator surface and a
#: same-family twin holding an r9 slot (a1, g3, h1, j6+j6c, j7, p4,
#: e1 respectively); all seven stay parity-green and lead the r10
#: freshness queue.
#: Round-10 rotation: the seven r7-stale deferrals lead (a2/g4/h3/j6b/
#: j9/p5/u1 — the documented r9 deferrals, each pure-SQL with an
#: untouched operator surface), then 13 of the 18 r8-last-green generic
#: queries. Five r8-green queries defer one round to fund the nine llm
#: heads (seven r9 additions + two new compositions) within the hard
#: 50-slot budget — aj2_asof_bucketed (twin aj1 r9), g1_rollup_returnflag
#: (twins g3 r9 / q1 in), h2_range_pruned_scan (twins h1 r9 / p4 r9),
#: j5_composite_key_join (twin d_enrich_geth_traces holds an r10 domain
#: slot), w4_rolling_range_window (twins w1/w2 r9) — all parity-green,
#: leading the r11 freshness queue.
#: Round-11 rotation: the five r8-green family-twinned deferrals the
#: r10 verdict queued lead, then three r9 picks (a1 — the verify
#: family's generic anchor; e1 — the set-op family; aj1 — the as-of
#: join whose bucketed twin aj2 holds the slot ahead of it). The
#: r10-green thirteen rotate out parity-pinned; no generic source
#: changed this round.
#: Round-13 deferral (see queries.llm.ROTATION_DEFERRALS for the
#: mechanism): the 50-slot budget is 3 over; j6b defers one round —
#: pure-SQL anti-join variant whose operator surface is untouched and
#: whose family carries FOUR r12 greens (j6_anti_join_customers,
#: j6c_anti_join_bucket_pruned, j8_semi_join_customers, d_new_tokens).
#: Must lead the r14 rotation.
#: Round-14 rotation: j6b leads (its r13 deferral grace is exhausted).
#: The six r11-stale generic queries defer one round — the corpus-wide
#: 50-slot budget is 11 over (see queries.llm.ROTATION_DEFERRALS), and
#: every generic candidate is a pure-SQL extension query whose operator
#: surface is untouched since r10 (optimization rounds changed
#: registration lists only) with an r12/r13-green family twin.
ROTATION_DEFERRALS = {
    "a1_count_existence": (
        "twin a2_count_col_vs_star is r13-green — same count/existence "
        "family; pure-SQL, surface untouched since r10"
    ),
    "aj2_asof_bucketed": (
        "twin aj1_asof_clicks is r12-green — same as-of join operator, "
        "bucketed variant; pure-SQL, surface untouched since r10"
    ),
    "g1_rollup_returnflag": (
        "twins g3_cube_priority (r12) and q1_pricing_summary (r13) — "
        "same grouping-sets family; pure-SQL, surface untouched since "
        "r10"
    ),
    "h2_range_pruned_scan": (
        "twins h1_hourly_events (r12) and p4_date_range_scan (r12) — "
        "same range-pruned scan family; pure-SQL, surface untouched "
        "since r10"
    ),
    "j5_composite_key_join": (
        "twin j1_order_revenue_3way is r13-green — same multi-key join "
        "family; pure-SQL, surface untouched since r10"
    ),
    "w4_rolling_range_window": (
        "twins w1_topk_per_user / w2_running_sum are r12-green — same "
        "window-function family; pure-SQL, surface untouched since r10"
    ),
}

DRIVER_QUERIES = [
    # r14 rotation: the r13 deferral (grace exhausted; the J-6 family
    # carries four r12 greens). The six r11-stale generics defer one
    # round (above) to fund the r13-rewritten llm family's driver
    # re-certification within the 50-slot budget.
    "j6b_anti_join_prefiltered",
]

#: columns profiled by x3 (orderable subset of orders)
_X3_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]


def x3_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (operators.profile) on its oracle-able surface:
    per-column row/null counts and min/max as strings (the HLL++
    approx_distinct column is implementation-defined and excluded from
    the compared projection; its accuracy is pinned in test_profile)."""
    from ..operators.profile import profile_table

    prof = profile_table(_t(spark, sf_dir, "orders"), columns=_X3_COLS)
    return prof.select(
        "column", "dtype", "n_rows", "n_nulls", "min_value", "max_value"
    )


def m3_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental additive aggregate maintenance
    (operators.incremental.merge_additive): a cumulative per-customer
    order aggregate (pre-1996 history) folded with a 'day' batch (the
    rest) must equal the full recomputation, which is exactly what the
    oracle computes over the raw table."""
    from ..operators.incremental import merge_additive

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        _cents(F.col("o_totalprice")).alias("cents"),
        F.lit(1).cast("bigint").alias("n_orders"),
        "o_orderdate",
    )
    cutoff = F.lit("1996-01-01").cast("timestamp")
    cum = (
        o.filter(F.col("o_orderdate") < cutoff)
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"), F.sum("n_orders").alias("n_orders"))
    )
    # NULL-safe complement: a NULL o_orderdate row must land in exactly
    # one side (the oracle aggregates the whole table unconditionally)
    day = o.filter(
        F.col("o_orderdate").isNull() | (F.col("o_orderdate") >= cutoff)
    ).select("o_custkey", "cents", "n_orders")
    merged = merge_additive(cum, day, ["o_custkey"], ["cents", "n_orders"])
    return merged.select(
        "o_custkey",
        (F.col("cents") / F.lit(100.0)).cast("double").alias("total_price"),
        "n_orders",
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "a1_count_existence": a1_count_existence,
    "a2_count_col_vs_star": a2_count_col_vs_star,
    "g1_rollup_returnflag": g1_rollup_returnflag,
    "j1_order_revenue_3way": j1_order_revenue_3way,
    "j5_composite_key_join": j5_composite_key_join,
    "j6_anti_join_customers": j6_anti_join_customers,
    "j6b_anti_join_prefiltered": j6b_anti_join_prefiltered,
    "j6c_anti_join_bucket_pruned": j6c_anti_join_bucket_pruned,
    "h2_range_pruned_scan": h2_range_pruned_scan,
    "j7_region_rollup": j7_region_rollup,
    "e1_except_parts": e1_except_parts,
    "p4_date_range_scan": p4_date_range_scan,
    "p5_conjunctive_filter": p5_conjunctive_filter,
    "f_scalar_surface": f_scalar_surface,
    "h1_hourly_events": h1_hourly_events,
    "w1_topk_per_user": w1_topk_per_user,
    "w2_running_sum": w2_running_sum,
    "w4_rolling_range_window": w4_rolling_range_window,
    "h3_hopping_windows": h3_hopping_windows,
    "x2_above_global_avg": x2_above_global_avg,
    "pv2_unpivot_metrics": pv2_unpivot_metrics,
    "f2_array_surface": f2_array_surface,
    "m2_scd2_history": m2_scd2_history,
    "g4_purchase_trend": g4_purchase_trend,
    "t1_topk_orders": t1_topk_orders,
    "u1_intersect_users": u1_intersect_users,
    "sk1_salted_agg": sk1_salted_agg,
    "w3_sessionization": w3_sessionization,
    "aj1_asof_clicks": aj1_asof_clicks,
    "aj2_asof_bucketed": aj2_asof_bucketed,
    "rj1_promo_range_join": rj1_promo_range_join,
    "g2_grouped_quantiles": g2_grouped_quantiles,
    "j8_semi_join_customers": j8_semi_join_customers,
    "j9_full_outer_rollup": j9_full_outer_rollup,
    "g3_cube_priority": g3_cube_priority,
    "pv1_pivot_linestatus": pv1_pivot_linestatus,
    "m1_upsert_dimension": m1_upsert_dimension,
    "x1_approx_aggregates": x1_approx_aggregates,
    "x3_profile_orders": x3_profile_orders,
    "m3_incremental_merge": m3_incremental_merge,
}

def _m(x: str) -> str:
    """Exact money sum: integer cents, order-independent, emitted as
    DOUBLE (hash-stable; see header). The explicit DOUBLE cast before
    the division keeps DuckDB out of DECIMAL arithmetic entirely."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({x})*100) AS BIGINT)) AS DOUBLE)"
        f" / CAST(100.0 AS DOUBLE))"
    )


ORACLES = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_m('l_quantity')} AS sum_qty,
               {_m('l_extendedprice')} AS sum_base_price,
               {_m('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1997-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "a1_count_existence": """
        SELECT COUNT(*) AS cnt FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    """,
    "a2_count_col_vs_star": """
        SELECT COUNT(NULLIF(event_type, 'error')) AS cnt_col,
               COUNT(*) AS cnt_star
        FROM events
    """,
    "g1_rollup_returnflag": f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               {_m('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "j1_order_revenue_3way": f"""
        SELECT o.o_orderkey, o.o_orderdate, c.c_name, r.revenue
        FROM orders o
        JOIN (
            SELECT l_orderkey,
                   {_m('l_extendedprice * (1.0 - l_discount)')} AS revenue
            FROM lineitem GROUP BY l_orderkey
        ) r ON o.o_orderkey = r.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'AUTOMOBILE'
    """,
    "j5_composite_key_join": f"""
        SELECT l.l_partkey, l.l_suppkey, p.pair_lines,
               {_m('l.l_quantity')} AS sum_qty
        FROM lineitem l
        JOIN (
            SELECT l_partkey, l_suppkey, COUNT(*) AS pair_lines
            FROM lineitem GROUP BY l_partkey, l_suppkey
            HAVING COUNT(*) >= 3
        ) p ON l.l_partkey = p.l_partkey AND l.l_suppkey = p.l_suppkey
        GROUP BY l.l_partkey, l.l_suppkey, p.pair_lines
    """,
    "j6_anti_join_customers": f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate < TIMESTAMP '{_J6_CUTOFF}'
        )
    """,
    "j6b_anti_join_prefiltered": f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate < TIMESTAMP '{_J6_CUTOFF}'
        )
    """,
    "j6c_anti_join_bucket_pruned": f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate < TIMESTAMP '{_J6_CUTOFF}'
        )
    """,
    "h2_range_pruned_scan": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
                    / CAST(100.0 AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-03-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY o_orderpriority
    """,
    "j7_region_rollup": f"""
        SELECT r.r_name,
               COUNT(*) AS n_customers,
               {_m('c.c_acctbal')} AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "e1_except_parts": """
        SELECT p_partkey AS partkey FROM part
        EXCEPT
        SELECT l_partkey AS partkey FROM lineitem
    """,
    "p4_date_range_scan": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1995-03-01'
    """,
    "p5_conjunctive_filter": """
        SELECT event_id, user_id, value FROM events
        WHERE event_type = 'purchase' AND value > 100.0
          AND NULLIF(props, '') IS NOT NULL
    """,
    "f_scalar_surface": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               substr(event_type, 1, 3) AS et3,
               array_to_string(string_split(event_type, 'i'), '|') AS et_split,
               replace(event_type, 'c', 'k') AS et_replace,
               CASE WHEN value > 50.0 THEN 'hi' ELSE 'lo' END AS band,
               CAST(FLOOR(value) AS BIGINT) AS value_floor,
               make_timestamp(CAST(FLOOR(value) AS BIGINT) * 1000000) AS ts_derived
        FROM events
    """,
    "h1_hourly_events": f"""
        SELECT date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events,
               {_m('value')} AS sum_value
        FROM events
        GROUP BY date_trunc('hour', ts)
    """,
    "w4_rolling_range_window": """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS rolling_7d
        FROM orders
    """,
    "h3_hopping_windows": """
        WITH x AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS es,
                   epoch(ts) AS ef
            FROM events
        ),
        wins AS (
            SELECT event_type,
                   ((es // 600) - i) * 600 AS window_start
            FROM x, UNNEST([0, 1, 2]) AS u(i)
            WHERE ((es // 600) - i) * 600 > ef - 1800
        )
        SELECT window_start, event_type, COUNT(*) AS n_events
        FROM wins GROUP BY window_start, event_type
    """,
    "x2_above_global_avg": """
        WITH a AS (
            SELECT SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS tot,
                   COUNT(*) AS n
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem, a
        WHERE CAST(floor(l_extendedprice * 100.0) AS BIGINT) * n > tot
    """,
    "g4_purchase_trend": """
        WITH p AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - MIN(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id) AS x,
                   CAST(floor(value * 100.0) AS BIGINT) AS y
            FROM events WHERE event_type = 'purchase'
        ),
        a AS (
            SELECT user_id, COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM p GROUP BY user_id
        )
        SELECT user_id, n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                   AS slope_cents_per_sec
        FROM a
        WHERE n >= 2 AND n * sxx - sx * sx > 0
    """,
    "m2_scd2_history": """
        WITH dim AS (
            SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
                   TIMESTAMP '1995-01-01' AS valid_from,
                   CAST(NULL AS TIMESTAMP) AS valid_to
            FROM customer
        ),
        upd AS (
            SELECT o_custkey AS c_custkey,
                   CAST(COUNT(*) % 25 AS BIGINT) AS nation,
                   TIMESTAMP '1996-04-01' AS eff
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-03-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY o_custkey
        ),
        chg AS (
            SELECT d.c_custkey, d.nation AS old_nation,
                   u.nation AS new_nation, u.eff
            FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
            WHERE d.nation <> u.nation
        )
        SELECT d.c_custkey, d.nation, d.valid_from, d.valid_to
        FROM dim d
        WHERE NOT EXISTS (
            SELECT 1 FROM chg WHERE chg.c_custkey = d.c_custkey
        )
        UNION ALL
        SELECT c_custkey, old_nation, TIMESTAMP '1995-01-01', eff FROM chg
        UNION ALL
        SELECT c_custkey, new_nation, eff, CAST(NULL AS TIMESTAMP) FROM chg
    """,
    "pv2_unpivot_metrics": """
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value
        FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price_cents' AS metric,
               sum_price_cents AS value
        FROM wide
    """,
    "f2_array_surface": """
        SELECT vec_id,
               len(embedding) AS dim,
               ROUND(list_aggregate(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   'sum'), 6) AS sq_norm,
               CAST(list_max(embedding) AS DOUBLE) AS max_elem
        FROM embeddings
    """,
    "w1_topk_per_user": """
        SELECT user_id, event_id, rn FROM (
            SELECT user_id, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn <= 3
    """,
    "w2_running_sum": f"""
        SELECT user_id, event_id,
               CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS running_value
        FROM events WHERE event_type = 'purchase'
    """,
    "t1_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "u1_intersect_users": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
    "sk1_salted_agg": """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(FLOOR(l_quantity*100) AS BIGINT)) AS DOUBLE)
                    / CAST(100.0 AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "w3_sessionization": """
        WITH x AS (
            SELECT user_id, event_id, ts,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_us,
                   epoch_us(ts) AS us
            FROM events
        )
        SELECT user_id, event_id,
               CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM x
    """,
    "aj1_asof_clicks": """
        WITH clicks AS (
            SELECT user_id, ts AS click_ts, MAX(value) AS click_value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_value
        FROM p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    "aj2_asof_bucketed": """
        WITH clicks AS (
            SELECT user_id, ts AS click_ts, MAX(value) AS click_value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_value
        FROM p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    "rj1_promo_range_join": f"""
        WITH r AS (
            SELECT o_orderkey,
                   o_orderdate - INTERVAL 3 DAY  AS promo_start,
                   o_orderdate + INTERVAL 11 DAY AS promo_end
            FROM orders WHERE o_totalprice > 495000.0
        )
        SELECT r.o_orderkey, COUNT(*) AS n_shipped,
               {_m('l.l_extendedprice')} AS sum_price
        FROM r JOIN lineitem l
          ON l.l_shipdate >= r.promo_start AND l.l_shipdate < r.promo_end
        GROUP BY r.o_orderkey
    """,
    "g2_grouped_quantiles": """
        SELECT l_returnflag, COUNT(*) AS n_rows,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.5)  AS q50,
               quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "j8_semi_join_customers": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0
        )
    """,
    "j9_full_outer_rollup": """
        WITH o AS (
            SELECT o_custkey AS cid, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ), e AS (
            SELECT user_id AS cid, COUNT(*) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT COALESCE(o.cid, e.cid) AS cid,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_events, 0) AS n_events
        FROM o FULL OUTER JOIN e ON o.cid = e.cid
    """,
    "g3_cube_priority": f"""
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               {_m('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "pv1_pivot_linestatus": f"""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(FLOOR(l_quantity*100) AS BIGINT) END) AS DOUBLE)
                    / CAST(100.0 AS DOUBLE) AS qty_open,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(FLOOR(l_quantity*100) AS BIGINT) END) AS DOUBLE)
                    / CAST(100.0 AS DOUBLE) AS qty_filled
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "x3_profile_orders": """
        WITH stats AS (
            SELECT 'o_orderkey' AS "column", 'bigint' AS dtype,
                   COUNT(*) AS n_rows,
                   COUNT(*) - COUNT(o_orderkey) AS n_nulls,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
                   CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
            FROM orders
            UNION ALL
            SELECT 'o_custkey', 'bigint', COUNT(*),
                   COUNT(*) - COUNT(o_custkey),
                   CAST(MIN(o_custkey) AS VARCHAR),
                   CAST(MAX(o_custkey) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', 'double', COUNT(*),
                   COUNT(*) - COUNT(o_totalprice),
                   CAST(MIN(o_totalprice) AS VARCHAR),
                   CAST(MAX(o_totalprice) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', 'string', COUNT(*),
                   COUNT(*) - COUNT(o_orderpriority),
                   MIN(o_orderpriority), MAX(o_orderpriority)
            FROM orders
        )
        SELECT * FROM stats
    """,
    "m3_incremental_merge": """
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS DOUBLE)
                   / CAST(100.0 AS DOUBLE) AS total_price,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_custkey
    """,
    "x1_approx_aggregates": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS approx_users_ok,
               TRUE AS approx_median_ok
        FROM events
        GROUP BY event_type
    """,
    "m1_upsert_dimension": """
        WITH cur AS (
            SELECT c_custkey, c_name,
                   CAST(FLOOR(c_acctbal*100) AS BIGINT) AS cents
            FROM customer
        ), updates AS (
            SELECT c_custkey, c_name, cents + 10000 AS cents
            FROM cur WHERE c_custkey % 10 = 0
        )
        SELECT c_custkey, c_name,
               CAST(cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS acctbal
        FROM (
            SELECT * FROM cur
            WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
            UNION ALL
            SELECT * FROM updates
        )
    """,
}
