"""Single-pass table profiling: per-column null counts, approximate
distinct counts, and value ranges — the schema-health pass a 100 TB
pipeline runs before committing to a full processing job (and the
cheap way to spot a broken export: a column that is suddenly 100%
NULL, a distinct count that collapsed, a timestamp range outside the
expected day).

Scale design: ONE aggregation over the table computes every statistic
(per-column expressions inside a single `agg`), so the cost is one
scan + one 1-row reduce regardless of column count — no per-column
jobs, no driver loops over data. HLL++ (`approx_count_distinct`)
keeps per-column state O(1). The wide 1-row result is unpivoted to
(column, stat) rows driver-side from literals — never from data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    StringType,
    TimestampType,
)

__all__ = ["profile_table", "snapshot_diff", "corpus_stats"]

#: types whose min/max are meaningful and safely castable to string
_ORDERABLE = (NumericType, StringType, TimestampType, DateType, BooleanType)


def profile_table(
    df: DataFrame, rsd: float = 0.05, columns: list[str] | None = None
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per column:
    ``(column, dtype, n_rows, n_nulls, null_frac, approx_distinct,
    min_value, max_value)`` — min/max as strings (NULL for unorderable
    types like arrays/structs/binary), distinct via HLL++ at ``rsd``
    relative error.
    """
    fields = {f.name: f for f in df.schema.fields}
    names = list(columns) if columns is not None else list(fields)
    unknown = [n for n in names if n not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for n in names:
        c = F.col(n)
        aggs.append(
            F.count(F.when(c.isNull(), F.lit(1))).alias(f"__nulls_{n}")
        )
        aggs.append(F.approx_count_distinct(n, rsd=rsd).alias(f"__dist_{n}"))
        if isinstance(fields[n].dataType, _ORDERABLE):
            aggs.append(F.min(c).cast("string").alias(f"__min_{n}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{n}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{n}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{n}"))

    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(n).alias("column"),
            F.lit(fields[n].dataType.simpleString()).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{n}").alias("n_nulls"),
            F.when(F.col("__n") > 0, F.col(f"__nulls_{n}") / F.col("__n"))
            .otherwise(F.lit(None))
            .alias("null_frac"),
            F.col(f"__dist_{n}").alias("approx_distinct"),
            F.col(f"__min_{n}").alias("min_value"),
            F.col(f"__max_{n}").alias("max_value"),
        )
        for n in names
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def _quantile_col_name(p: float) -> str:
    """``q_<pct>`` with the decimals preserved: 0.25 -> ``q_25``,
    0.125 -> ``q_12_5``, 0.29 -> ``q_29`` (NOT the float-truncated
    ``q_28``). ``round(..., 10)`` absorbs binary-float noise before
    formatting so p*100 never truncates a hair below an integer."""
    return "q_" + format(round(p * 100, 10), "g").replace(".", "_")


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float] = (0.25, 0.5, 0.75),
    mode: str = "auto",
    max_exact_group_rows: int = 10_000_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """Grouped quantiles with a memory-bounded scale path.

    Spark's exact ``percentile`` BUFFERS every value of a group on the
    reducer that owns it — per-group memory is O(group rows), which on
    a 100 TB table with heavy groups (or one runaway hot key) is an
    executor OOM, not a slowdown. ``approx_percentile`` keeps a
    Greenwald-Khanna sketch instead: per-group state is O(accuracy)
    regardless of group size, with rank error ≤ 1/accuracy (so
    accuracy=10_000 pins every reported quantile q to a value whose
    true rank is within ±0.01% of q·n — tests pin this bound).

    ``mode``:
    - ``"exact"`` / ``"approx"`` — caller decides (exact is the
      oracle-matching form; approx is the unconditional scale form);
    - ``"auto"`` — one narrow pre-pass (groupBy count, map-side
      partial, same shuffle key the quantile agg needs anyway) finds
      the LARGEST group; above ``max_exact_group_rows`` the sketch
      path is taken. The default bound (10M rows ≈ 80 MB of doubles
      per group buffer) fits comfortably in a 4 GB executor with room
      for several concurrent groups; size it to
      executor_memory / (8 B × concurrent groups per executor).
      The pre-pass is one extra scan — worth it exactly when the
      alternative is an unbounded buffer; callers who know their
      group sizes should pass an explicit mode.

    Output: group_cols + ``q_<pct>`` double columns, identical column
    names in both modes so a caller can switch without schema churn.
    """
    if mode not in ("auto", "exact", "approx"):
        raise ValueError(f"unknown grouped_quantiles mode {mode!r}")
    if mode == "auto":
        largest = (
            df.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("m"))
            .collect()[0]["m"]
        )
        mode = (
            "approx"
            if largest is not None and largest > max_exact_group_rows
            else "exact"
        )
    probs = list(probabilities)
    names = [_quantile_col_name(p) for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"duplicate quantile column names {names} for "
            f"probabilities {probs}"
        )
    if mode == "exact":
        aggs = [
            F.percentile(value_col, p).alias(name)
            for p, name in zip(probs, names)
        ]
    else:
        # one sketch per group shared across all probabilities, not
        # one per quantile: approx_percentile takes the array form
        arr = F.expr(
            f"approx_percentile({value_col}, "
            f"array({', '.join(str(p) for p in probs)}), {accuracy})"
        )
        aggs = [
            arr.getItem(i).cast("double").alias(name)
            for i, name in enumerate(names)
        ]
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two corpus snapshots — ``(id, status)`` for
    every id present in either, status ∈ ``added`` / ``removed`` /
    ``changed`` / ``unchanged``. The release audit a dataset pipeline
    runs between crawls (what did this month's snapshot actually do
    to the corpus?), and the input to incremental downstream work:
    ``added`` ∪ ``changed`` is exactly the set to re-embed, re-index
    (`append_ivf_index` / `append_bm25_index` for added;
    delete-then-compact-then-re-add for changed), and re-score.

    ``compare_cols`` defaults to every shared non-id column;
    comparison is per-column NULL-SAFE equality (a NULL→NULL column
    is unchanged, NULL→value is changed — `<=>` semantics, which
    plain equality would silently misread as changed-or-unknown).

    One full-outer join on the id — both sides are corpus-sized, so
    the shuffle is the honest floor (no broadcast assumption); the
    comparison runs inside the join's projection, no second pass.
    Contract: one row per id per snapshot (the corpus-id invariant
    everywhere in this engine); duplicate ids multiply join rows as
    in any keyed join.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c != id_col and c in new.columns
        ]
    missing = [
        c
        for c in compare_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(
            f"compare_cols not in both snapshots: {missing}"
        )
    o = old.select(
        F.col(id_col),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(id_col),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(F.col(id_col), status.alias("status"))
    )


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source", "lang"),
) -> DataFrame:
    """One-row corpus summary — the data-card numbers a dataset
    release publishes (HF dataset cards, the Pile/ROOTS papers'
    corpus tables): ``(n_docs, n_tokens, n_chars, mean_doc_tokens,
    n_<group>s ..., top_<group> ...)`` with one distinct-count and
    modal value per ``group_cols`` entry (top by count, ties broken
    by value ASC for determinism).

    Plan: ONE pass for the global aggregates (map-side partial) plus
    one tiny groupBy per group column whose result folds in as a
    broadcast 1-row aggregate — group cardinality ~ sources/langs,
    never corpus. Token counts reuse `dedup.tokenize`'s whitespace
    discipline so the numbers agree with every other operator's."""
    from .dedup import tokenize

    t = F.col(text_col)
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(tokenize(t))), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.coalesce(F.sum(F.length(t)), F.lit(0))
        .cast("long")
        .alias("n_chars"),
    ).withColumn(
        "mean_doc_tokens",
        F.when(
            F.col("n_docs") > 0,
            F.round(F.col("n_tokens") / F.col("n_docs"), 6),
        ),
    )
    for g in group_cols:
        # ONE always-one-row fold per dimension (distinct count +
        # modal value via min_by over (−count, value) — max count,
        # then value ASC): an empty corpus yields a zeros/NULLs card
        # row, never a vanished card (a limit-1 modal side would
        # annihilate the crossJoin on empty input)
        dim = (
            docs.groupBy(g)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.count(F.lit(1)).alias(f"n_{g}s"),
                F.min_by(
                    F.col(g),
                    F.struct(
                        (-F.col("_n")).alias("a"), F.col(g).alias("b")
                    ),
                ).alias(f"top_{g}"),
            )
        )
        base = base.crossJoin(F.broadcast(dim))
    return base
