"""Sampling / dataset-partitioning operators for training-data
pipelines: per-group quota capping, deterministic content-hash dataset
splits, hash-mod downsampling.

A pretraining pipeline at 100 TB caps domains so no single source
dominates the mixture, assigns train/val/test membership
deterministically (membership must survive re-runs, repartitions, and
joins — so a content hash of a stable id, never ``rand()``), and
downsamples by hash for cheap profiling passes. Everything here is a
JVM builtin expression.

Determinism across engines: assignment compares a fixed-length md5
hex *prefix* lexicographically (``substr(md5(id), 1, 2) < 'c0'``),
which is numeric order for same-length lowercase hex — bit-identical
in DuckDB/Trino/Spark, with no hex→int conversion that engines spell
differently. 2 hex chars = 256 buckets; pass ``chars=4`` for 65536
when finer fractions are needed.

Scale posture: ``cap_per_group`` is one shuffle on the group key plus
a per-group sort — fine while every group fits a task's spill budget.
A pathological mega-domain (one source = 30% of the corpus) wants
``cap_per_group_prefiltered``: a salted pre-top-k bounds what the
single hot reducer ever sees to ``k × salt_buckets`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_hex",
    "assign_split",
    "leakage_safe_split",
    "split_leakage_report",
    "sample_by_hash",
    "cap_per_group",
    "cap_per_group_prefiltered",
    "budget_per_group",
    "stratified_sample",
    "temperature_sample",
    "epoch_upsample",
    "execute_mixture",
    "pack_sequences",
    "shuffle_shards",
    "write_training_shards",
]


def hash_hex(id_col: Column, chars: int = 2) -> Column:
    """Lowercase md5-hex prefix of the id's string form — the
    deterministic, engine-portable randomness source for splits and
    samples. ``chars`` hex chars = ``16**chars`` uniform buckets."""
    return F.substring(F.md5(id_col.cast("string")), 1, chars)


def _hex2(bucket: int) -> str:
    # 256 is deliberately rejected: format(256, '02x') is '100' (3
    # chars), and comparing a 2-char md5 prefix against it
    # lexicographically keeps only hashes starting '0' — the silent
    # ~1/16 sample the "keep everything" caller least expects. Callers
    # wanting full-keep special-case the boundary instead
    # (sample_by_hash skips its filter at keep=256).
    if not 0 <= bucket < 256:
        raise ValueError(
            f"bucket boundary out of range [0, 256): {bucket}"
        )
    return format(bucket, "02x")


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 192,
    val: int = 224,
) -> DataFrame:
    """Add a ``split`` column: train/val/test by 256-bucket id hash.

    ``train``/``val`` are upper bucket boundaries out of 256 — the
    default 192/224 gives 75% / 12.5% / 12.5%. Membership is a pure
    function of the id: stable under re-runs and immune to row order,
    unlike ``randomSplit``.
    """
    h = hash_hex(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(h < F.lit(_hex2(train)), F.lit("train"))
        .when(h < F.lit(_hex2(val)), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def leakage_safe_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    train: int = 192,
    val: int = 224,
    max_docs_per_band: int | None = None,
) -> DataFrame:
    """`assign_split`, but keyed on the document's NEAR-DUP CLUSTER
    instead of its own id — the leakage-safe eval split. A per-doc
    hash split puts two near-identical documents on opposite sides of
    the train/test boundary at exactly the corpus's near-dup rate,
    which is train-on-test contamination by construction (the same
    failure decontamination sweeps hunt across EXTERNAL benchmarks,
    here produced internally by the split itself). Keying the hash on
    the cluster representative sends every member of a component to
    ONE side.

    Composition of the engine's own pieces: `dedup.minhash_dedup_pairs`
    (banded LSH + exact verify at ``threshold``; pass
    ``max_docs_per_band`` in boilerplate-heavy corpora — the
    production valve) → `dedup.duplicate_clusters` (min-label CC) →
    hash the CLUSTER id for clustered docs, the doc's own id for
    singletons (coalesce — singletons dominate, and their key equals
    plain `assign_split`'s, so the two splits agree everywhere
    near-dups don't exist). Split fractions hold in expectation over
    CLUSTERS rather than docs — a giant component moves together, the
    point of the exercise.

    Returns ``docs`` + ``split`` + ``split_key`` (the cluster id or
    own id the hash was taken over — keep it in the export manifest
    so a later audit can re-derive membership).
    """
    from .dedup import duplicate_clusters, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        docs,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        max_docs_per_band=max_docs_per_band,
    )
    labels = duplicate_clusters(pairs).withColumnRenamed(
        "cluster_id", "_ck"
    )
    keyed = docs.join(
        labels.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("split_key", F.coalesce(F.col("_ck"), F.col(id_col)))
    h = hash_hex(F.col("split_key"))
    return (
        keyed.withColumn(
            "split",
            F.when(h < F.lit(_hex2(train)), F.lit("train"))
            .when(h < F.lit(_hex2(val)), F.lit("val"))
            .otherwise(F.lit("test")),
        )
        .drop("_ck")
    )


def split_leakage_report(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    n_hashes: int = 64,
    n_bands: int = 32,
    max_docs_per_band: int | None = None,
) -> DataFrame:
    """The split AUDIT — near-dup pair counts by split pair:
    ``(split_a, split_b, n_pairs)`` with the pair's splits
    least/greatest-normalized. CROSS-split rows are train-on-test
    contamination by construction — the exact failure
    `leakage_safe_split` exists to prevent, here MEASURED so it can
    be asserted: on an externally-provided split, a legacy
    random/hash split, or as the regression check that this engine's
    own cluster-keyed split reports zero cross rows. Same-split rows
    are context (the corpus's internal near-dup rate).

    Pairs come from `dedup.minhash_dedup_pairs` (banded LSH + exact
    verify at ``threshold``; ``max_docs_per_band`` is the standing
    production valve), so the report costs one dedup pass + two
    id-keyed split joins + a tiny groupBy — |splits|² output rows."""
    from .dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        docs,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        n_hashes=n_hashes,
        n_bands=n_bands,
        max_docs_per_band=max_docs_per_band,
    )
    splits = docs.select(F.col(id_col), F.col(split_col))
    return (
        pairs.join(
            splits.select(
                F.col(id_col).alias("id_a"),
                F.col(split_col).alias("_sa"),
            ),
            "id_a",
        )
        .join(
            splits.select(
                F.col(id_col).alias("id_b"),
                F.col(split_col).alias("_sb"),
            ),
            "id_b",
        )
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def sample_by_hash(df: DataFrame, id_col: str, keep: int) -> DataFrame:
    """Deterministic ~keep/256 downsample by id hash — the profiling
    pass a 100 TB pipeline runs instead of ``.sample()`` (whose output
    changes per run and per partitioning). ``keep=256`` is the
    documented keep-everything boundary: no filter at all."""
    if keep == 256:
        return df
    return df.filter(hash_hex(F.col(id_col)) < F.lit(_hex2(keep)))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Quota cap: keep at most ``k`` rows per group under a
    deterministic preference order (pass a total order — include a
    unique id as the last sort key)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def cap_per_group_prefiltered(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    k: int,
    id_col: str = "doc_id",
    salt_buckets: int = 32,
    rank_col: str = "rk",
) -> DataFrame:
    """Skew-safe quota cap: salted pre-top-k, then the global window.

    Phase 1 windows over ``(group, salt)`` — the hot group's rows
    spread across ``salt_buckets`` reducers, each emitting at most
    ``k`` — so phase 2's single-reducer-per-group window sees at most
    ``k × salt_buckets`` rows per group regardless of domain skew.
    Result is identical to :func:`cap_per_group`: a row outside some
    salt bucket's top-k is outranked by k rows of its own group and so
    can never be in the group's global top-k.
    """
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    wl = Window.partitionBy(F.col(group_col), salt).orderBy(*order_cols)
    local = (
        df.withColumn("_lrk", F.row_number().over(wl))
        .filter(F.col("_lrk") <= k)
        .drop("_lrk")
    )
    return cap_per_group(local, group_col, order_cols, k, rank_col)


def budget_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    budget: int,
    weight_col: str,
    cum_col: str = "cum_w",
) -> DataFrame:
    """Quota cap in WEIGHT units (tokens, bytes, chars) instead of
    rows: admit rows per group in the caller's preference order until
    the group's cumulative weight would exceed ``budget`` — the
    token-denominated sibling of :func:`cap_per_group`. A pretraining
    mixture is specified in TOKENS, and documents are variable-length,
    so a row cap misstates the mix wherever length correlates with
    source (it always does: crawl domains differ in document length by
    orders of magnitude).

    Admission is the strict inclusive rule: a row is kept iff the
    cumulative weight INCLUDING it stays ≤ ``budget`` — the contract
    is "never exceed the budget", matching `pack_sequences`' drop rule
    for oversized documents. With non-negative weights the cumulative
    sum is monotone, so the kept set is a clean PREFIX of the
    preference order: the first overflowing row and everything after
    it are excluded (no best-fit backfilling — that would re-order
    the caller's preference). Negative weights are a caller error
    (monotonicity, and with it the prefix property, breaks); weigh
    with counts.

    Determinism: pass a TOTAL order (include the id as the last sort
    key) built from engine-stable keys — the module's md5-prefix
    discipline, or an explicit quality column with an id tiebreak.
    The cumulative sum is integer when ``weight_col`` is integer, so
    no float crosses the engine boundary.

    Scale shape: one window shuffle on the group key, same as
    `cap_per_group` — and the same hot-group hazard. The salted
    pre-cap trick does NOT transfer (a prefix sum needs the global
    group order; salt-local prefixes tell a row nothing about its
    global rank), so for a mega-group pre-bound the window's input
    with :func:`cap_per_group_prefiltered` at ``k = budget //
    min_expected_weight`` — rows beyond rank k can never fit in the
    budget, and the pre-cap's salted phase bounds the single-reducer
    load the way it does for row quotas.

    Returns the kept rows with ``cum_col`` (the running post-admission
    total) attached.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(cum_col, F.sum(weight_col).over(w)).filter(
        F.col(cum_col) <= F.lit(budget)
    )


def stratified_sample(
    df: DataFrame,
    strat_col: str,
    n_strata: int,
    per_stratum: int,
    id_col: str = "doc_id",
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Equal-mass stratified sampling over a continuous score: split
    the corpus into ``n_strata`` quality strata and keep
    ``per_stratum`` rows from EACH — the curation move both naive
    alternatives miss (top-K collapses onto the score head; a uniform
    sample reproduces the corpus's skew, starving sparse tails). The
    standard recipe for building calibration/eval slices across the
    quality spectrum, or a training mix that deliberately spans it.

    Two stratum-assignment forms, one selection rule:

    - ``boundaries=None`` (default): exact equal-mass strata via
      ``NTILE(n_strata)`` over ``(strat_col, id)`` — engine-exact and
      DuckDB-replayable (the registered oracle's form), but the
      global ntile window sorts on ONE reducer: fine to the low
      hundreds of millions of rows, and the honest hazard above that
      (the `profile.grouped_quantiles` exact-form caveat, same
      shape);
    - ``boundaries=[b1 < b2 < …]`` (production form): map-side
      assignment — stratum i is ``score ≤ b_i`` first match, else the
      last stratum — ZERO global sort; feed it cut points from
      `profile.grouped_quantiles`' sketch path (approximate
      boundaries move only rows near the cuts; pinned ≡ the ntile
      form on fixtures whose exact quantiles are supplied).

    Selection within a stratum keeps the ``per_stratum`` smallest
    ``md5(id)`` rows (id tiebreak) — the module's md5-prefix
    discipline, so membership survives re-runs and repartitions; the
    per-stratum window shuffles on the stratum id (n_strata reducers,
    each bounded by its stratum — pre-bound a pathological stratum
    with `cap_per_group_prefiltered` if per_stratum is huge).

    Returns the kept rows with ``stratum`` (1-based) and ``rk``
    attached. NULL scores sort first in both forms (they land in
    stratum 1 — filter upstream if unscored rows must not be
    sampled).
    """
    if n_strata < 1:
        raise ValueError(f"n_strata must be >= 1: {n_strata}")
    if per_stratum < 1:
        raise ValueError(f"per_stratum must be >= 1: {per_stratum}")
    if boundaries is not None:
        strictly_ascending = all(
            a < b for a, b in zip(boundaries, boundaries[1:])
        )
        if not strictly_ascending or len(boundaries) != n_strata - 1:
            # non-strict cuts would silently EMPTY a stratum (the
            # first-match CASE can never reach a duplicated boundary)
            raise ValueError(
                "boundaries must be n_strata - 1 STRICTLY ascending "
                "cut points"
            )
        stratum = F.lit(n_strata)
        for i in range(len(boundaries) - 1, -1, -1):
            stratum = F.when(
                F.col(strat_col) <= F.lit(float(boundaries[i])),
                F.lit(i + 1),
            ).otherwise(stratum)
        # NULL scores: a NULL comparison would fall through every
        # when() into the LAST stratum — pin them to stratum 1, where
        # the ntile form's nulls-first ordering puts them
        stratum = F.when(
            F.col(strat_col).isNull(), F.lit(1)
        ).otherwise(stratum)
        staged = df.withColumn("stratum", stratum)
    else:
        wn = Window.orderBy(
            F.col(strat_col).asc(), F.col(id_col).asc()
        )
        staged = df.withColumn("stratum", F.ntile(n_strata).over(wn))
    wk = Window.partitionBy("stratum").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        staged.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= per_stratum)
    )


def _temperature_quotas(
    df: DataFrame,
    group_col: str,
    total_budget: int,
    alpha: float,
    weight_scale: int,
) -> DataFrame:
    """The ONE n^alpha integer quota computation behind
    `temperature_sample` (cap direction) and `execute_mixture` (both
    directions) — extracted so the two fronts cannot drift: integer
    weights ``floor(weight_scale·n^alpha)``, BIGINT floor-division
    quotas, the correctly-rounded sqrt/identity spellings for the
    engine-stable alphas. Returns ``(group_col, quota)``."""
    n = F.col("_n")
    if alpha == 0.5:
        raw = F.sqrt(n)  # correctly-rounded IEEE sqrt, engine-identical
    elif alpha == 0:
        raw = F.lit(1.0)
    elif alpha == 1:
        raw = n.cast("double")
    else:
        raw = F.pow(n, F.lit(float(alpha)))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    weights = counts.select(
        group_col,
        F.floor(F.lit(float(weight_scale)) * raw).cast("bigint").alias("_w"),
    )
    return (
        weights.crossJoin(
            F.broadcast(weights.agg(F.sum("_w").alias("_tot")))
        )
        .select(
            group_col,
            F.expr(
                f"CAST({int(total_budget)} AS BIGINT) * _w DIV _tot"
            ).alias("quota"),
        )
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    total_budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    weight_scale: int = 1_000_000,
    rank_col: str = "rk",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Temperature-weighted source-mixture sampling: allocate a total
    document budget across groups with weight ``n_group^alpha``, then
    keep each group's quota deterministically (smallest md5(id) first)
    — the published mixture-flattening recipe (T5's examples-proportional
    mixing, arXiv:1910.10683 §3.5.2; the multilingual ``p^alpha``
    up/down-sampling of mBERT/XLM-R): ``alpha=1`` reproduces natural
    proportions, ``alpha=0`` a uniform per-source split, ``alpha~0.5``
    the usual compromise that keeps a mega-crawl from drowning small
    high-quality sources.

    Determinism across engines (the module's md5-prefix discipline):
    weights are INTEGERS ``floor(weight_scale * n^alpha)`` and quotas
    BIGINT floor-division ``total_budget * w DIV sum(w)`` — no float
    crosses an engine boundary for the alphas with correctly-rounded
    spellings (0, 0.5 via sqrt, 1); arbitrary alpha goes through
    ``pow``, stable within Spark but documented as last-ulp
    engine-dependent. Selection ranks by the full md5 hex of the id
    (ties on id), so membership survives re-runs and repartitions.
    Floor rounding leaves ``total_budget - sum(quota) < n_groups``
    docs unassigned by design — exactness over largest-remainder
    topping, which would need a cross-group ordering no engine pair
    computes identically.

    Scale shape: one narrow count aggregation, a tiny
    broadcast-joined quota table (group cardinality ~ sources, never
    corpus), and one window shuffle on the group key. A mega-source's
    window is the same hazard :func:`cap_per_group_prefiltered`
    handles — pass ``salt_buckets`` to bound it: a salted local
    top-quota pass caps what the hot group's single reducer sees at
    ``quota x salt_buckets`` rows (a row outside some salt bucket's
    top-quota is outranked by quota rows of its own group and can
    never make the global quota).

    Returns the kept rows with ``rank_col`` (1-based within group) and
    ``quota`` attached.
    """
    quotas = _temperature_quotas(
        df, group_col, total_budget, alpha, weight_scale
    )
    ordered = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    with_q = df.join(F.broadcast(quotas), group_col)
    if salt_buckets is not None:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        wl = Window.partitionBy(F.col(group_col), salt).orderBy(*ordered)
        with_q = (
            with_q.withColumn("_lrk", F.row_number().over(wl))
            .filter(F.col("_lrk") <= F.col("quota"))
            .drop("_lrk")
        )
    w = Window.partitionBy(group_col).orderBy(*ordered)
    return (
        with_q.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= F.col("quota"))
    )


def epoch_upsample(
    df: DataFrame,
    group_col: str,
    quotas,
    id_col: str = "doc_id",
    max_epochs: float | None = None,
    epoch_col: str = "epoch",
) -> DataFrame:
    """The UP-sampling half of mixture execution — repeat each group's
    documents to hit a per-group target ROW quota: ``floor(quota/n)``
    full epochs of the whole group plus a deterministic fractional
    remainder (smallest md5(id) first — the module's selection
    discipline, so membership survives re-runs and repartitions).
    `temperature_sample` plans and CAPS (it can only keep ≤ n rows
    per group); this executes the other direction of the published
    recipes — GPT-3's Table 2.2 weights small high-quality corpora at
    2-3+ epochs while CommonCrawl stays under 1, and the
    data-constrained-scaling result (Muennighoff et al. 2023,
    arXiv:2305.16264) motivates ``max_epochs``: repetition beyond ~4
    epochs adds little — the cap clamps each group's quota to
    ``floor(max_epochs · n)`` before the split.

    ``quotas`` is ``{group: target_rows}`` or a ``(group_col,
    quota)`` DataFrame (broadcast — group cardinality ~ sources).
    Output repeats input rows with a 0-based ``epoch_col`` copy
    index: downstream shard shuffle / packing interleaves copies, and
    ``(id, epoch)`` is the unique key. Groups without a quota row
    pass through unchanged as epoch 0 (quota = n). Plan shape: one
    count aggregate, a broadcast quota join, a zero-shuffle
    explode(sequence) for the full epochs, and one group-keyed window
    for the remainder — the window is the `temperature_sample` hazard
    and takes the same salting recipe if a group is mega-sized.
    """
    spark = df.sparkSession
    if isinstance(quotas, dict):
        # the group key's type comes from df's OWN column (a
        # hard-coded string schema would silently mistype an integer
        # group col and the quota join would miss every group; key
        # inference would fail outright on an empty dict — the
        # legitimate "no overrides, everything passes through" call)
        from pyspark.sql.types import LongType, StructField, StructType

        quotas = spark.createDataFrame(
            [(k, int(v)) for k, v in quotas.items()],
            StructType([
                StructField(
                    group_col, df.schema[group_col].dataType, True
                ),
                StructField("quota", LongType(), True),
            ]),
        )
    else:
        quotas = quotas.select(
            group_col, F.col("quota").cast("long").alias("quota")
        )
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    plan = counts.join(F.broadcast(quotas), group_col, "left").select(
        group_col,
        "_n",
        F.coalesce(F.col("quota"), F.col("_n")).alias("_q"),
    )
    if max_epochs is not None:
        plan = plan.withColumn(
            "_q",
            F.least(
                F.col("_q"),
                F.floor(F.lit(float(max_epochs)) * F.col("_n")).cast(
                    "long"
                ),
            ),
        )
    plan = plan.select(
        group_col,
        F.expr("_q DIV _n").alias("_full"),
        F.expr("_q % _n").alias("_rem"),
    )
    src = df.join(F.broadcast(plan), group_col)
    # full epochs: explode over [0, _full) — empty array when the
    # quota is below one epoch (sequence() alone would generate a
    # DESCENDING range there and resurrect rows)
    full = src.select(
        *df.columns,
        F.explode(
            F.when(
                F.col("_full") > 0,
                F.sequence(F.lit(0), (F.col("_full") - 1).cast("int")),
            ).otherwise(F.array())
        ).alias(epoch_col),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    rem = (
        src.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_rem"))
        .select(
            *df.columns, F.col("_full").cast("int").alias(epoch_col)
        )
    )
    return full.unionByName(rem)


def execute_mixture(
    df: DataFrame,
    group_col: str,
    total_budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    max_epochs: float | None = None,
    weight_scale: int = 1_000_000,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Plan AND execute a temperature mixture in BOTH directions in
    one call: the shared `_temperature_quotas` integer math decides
    each group's target, then `epoch_upsample` realizes it — groups
    above quota down-select to their smallest-md5 rows (epoch 0,
    exactly `temperature_sample`'s kept SET — same ordering, pinned
    in tests), groups below quota repeat whole epochs + an md5
    remainder. This is the one-call form of the published mixture
    recipes where weights imply BOTH under- and over-one-epoch rates
    (GPT-3 Table 2.2; XLM-R's p^alpha): planning with
    `temperature_sample` alone silently caps the up-side at 1 epoch.
    Output carries ``epoch_col``; total rows = Σ quotas (± nothing:
    each group lands exactly on its integer quota, unlike the cap
    form where a small group simply runs out). ``max_epochs`` bounds
    repetition (data-constrained-scaling guidance)."""
    quotas = _temperature_quotas(
        df, group_col, total_budget, alpha, weight_scale
    )
    return epoch_upsample(
        df,
        group_col,
        quotas,
        id_col=id_col,
        max_epochs=max_epochs,
        epoch_col=epoch_col,
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shard_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Training-sequence packing, concat-then-chunk semantics: within
    each shard, documents are laid end-to-end in ``id`` order and cut
    into fixed ``budget``-token sequences (the GPT-style packing step
    that turns a document corpus into equal-length training rows —
    documents may straddle a cut).

    Returns one row per document: its shard, whitespace-token count,
    token ``offset`` in the shard's concatenation, and the first/last
    sequence index it lands in. Empty documents are dropped (they
    occupy no tokens).

    One shuffle (the shard/offset window); shards pack independently,
    so parallelism is the shard count and a shard's window scan is
    linear. Token counting and the running offset are pure integer
    builtins — an oracle replicating the cumsum gets identical rows.

    ``n_tokens_col`` (r12): use a precomputed per-doc token count
    instead of the whitespace count — e.g. `text.bpe_encode`'s
    ``n_tokens``, which makes the packing EXACT under the trained
    vocabulary instead of whitespace-approximate (the llm_pack_bpe
    composition). Zero-token docs are dropped either way.
    """
    if n_tokens_col is not None:
        n_tok = F.col(n_tokens_col)
    else:
        norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
        # split("") is [""] (size 1), so empty/whitespace-only docs
        # need an explicit 0
        n_tok = F.when(norm == "", F.lit(0)).otherwise(
            F.size(F.split(norm, " "))
        )
    toks = docs.select(
        F.col(id_col),
        shard_col.cast("long").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = F.lit(int(budget)).cast("long")
    out = toks.withColumn(
        "offset", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / b).alias("seq_start"),
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / b).alias(
            "seq_end"
        ),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle for training export: every row gets
    ``shard_id = pmod(xxhash64(id, seed), n_shards)`` and rows arrive
    hash-ordered within their shard — the hash-sharded, hash-sorted
    layout a reproducible pretraining run reads.

    Determinism is the point: membership and order are pure functions
    of (id, seed), so they survive re-runs, input repartitioning, and
    cluster-size changes — unlike ``rand()`` or ``orderBy(rand())``
    (nondeterministic) and unlike a global ``orderBy(hash)`` (whose
    range boundaries come from nondeterministic sampling). One shuffle
    on shard_id + a per-shard sort; shards are independent, so
    parallelism is ``n_shards`` and a shard's sort is bounded by
    corpus/n_shards.

    A different ``seed`` is a different-but-equally-deterministic
    epoch order — the cheap way to get per-epoch reshuffles that are
    still replayable.
    """
    h = F.xxhash64(F.col(id_col), F.lit(int(seed)))
    return (
        df.withColumn("shard_id", F.pmod(h, F.lit(int(n_shards))))
        .withColumn("_order", h)
        .repartition(int(n_shards), "shard_id")
        .sortWithinPartitions("shard_id", "_order", id_col)
        .drop("_order")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 0,
    fmt: str = "json",
    max_records_per_file: int | None = None,
) -> None:
    """Export the corpus as ``shard_id=N`` directories in deterministic
    shuffle order (``shuffle_shards``): JSONL by default — the lingua
    franca training loaders consume — or parquet.

    ``max_records_per_file`` additionally splits a shard into
    fixed-size files (loader-friendly chunking) without touching
    membership or order. Idempotent overwrite per export.
    """
    if fmt not in ("json", "parquet"):
        raise ValueError("fmt must be 'json' or 'parquet'")
    writer = (
        shuffle_shards(df, id_col, n_shards, seed)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(fmt)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.save(path)
