"""Document deduplication operators for large-scale training-data
pipelines: exact, MinHash-LSH, SimHash, and n-gram Jaccard.

Scale design (the 100 TB posture):

- **Exact** is one shuffle on a 16-byte fingerprint — the minimum
  possible; skew is bounded because the key is a hash.
- **MinHash-LSH** never forms all pairs: per-doc shingle-hash SETS
  stay one array column, signatures/band hashes are one vectorized
  numpy reduction per Arrow batch (`minhash_band_rows_np`; the JVM
  64-fold formulation survives as `minhash_band_rows`), then banded —
  candidate pairs exist only inside a (band_id, band_hash) bucket. The
  first exchange in the pipeline is the band join; its volume is
  bounded by sum(bucket²) over near-duplicate buckets, not n².
- **SimHash** reduces each doc to one 64-bit signature; candidates are
  pairs sharing any 16-bit chunk (≤3-bit Hamming distance guarantee by
  pigeonhole over 4 chunks).
- **n-gram Jaccard** is the exact verifier: computed only on candidate
  pairs at scale (`verify_pairs`), or all qualifying pairs in the
  oracle-checked query path where n is small. Stop-shingles (appearing
  in > max_docs_per_shingle docs) are droppable to bound the self-join;
  the default keeps them for exactness.

Everything here is builtin expressions, with one deliberate exception:
MinHash signature generation in the pairs pipeline
(`minhash_band_rows_np`) is an Arrow-batched pandas UDF — one numpy
broadcast-min per batch — because 64 unrolled array-fold expressions
are the shape whole-stage codegen handles worst (measured ~10× slower
than the matmul-style kernel at sf0.1). The exact verifier stays pure
JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokenize(col: Column) -> Column:
    """Word tokens of the normalized text — same tokens as
    ``split(normalize_text(c), ' ')`` but in ONE regex pass (split on
    the whitespace run directly; the filter drops the empty strings a
    leading/trailing run produces). Empty docs yield [] rather than
    [''], which only matters to callers that explode without a
    min-one-shingle floor."""
    return F.filter(
        F.split(F.lower(col), r"\s+"), lambda t: t != F.lit("")
    )


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct
    content with the canonical (minimum) id and the duplicate count."""
    return (
        docs.select(
            F.col(id_col),
            F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def word_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle).

    Built with sequence+transform+explode — one pass, no Python.
    """
    words = tokenize(F.col(text_col))
    # split once per doc BEFORE the exchange: expressions referenced
    # inside a higher-order-function lambda re-evaluate their input
    # (no CSE into lambdas), so the words array must be a materialized
    # attribute — the repartition Exchange is the collapse barrier.
    # The repartition also fixes small-input parallelism (a handful of
    # input files would otherwise run everything on as many cores as
    # files) AND pre-satisfies every downstream groupBy(id)/window —
    # signature aggregation runs with no further shuffle.
    src = docs.select(
        F.col(id_col).alias("id"), words.alias("w")
    ).repartition(F.col("id"))
    # shingle i = words[i..i+k): array transform + slice, no window
    # sort; array_distinct gives per-doc DISTINCT with zero shuffle
    # (docs shorter than k yield one shingle of the whole doc —
    # slice truncates at the end, concat_ws skips nothing)
    return src.select(
        "id",
        F.explode(
            F.array_distinct(_kgram_string_array(F.col("w"), k))
        ).alias("shingle"),
    )


def _kgram_string_array(words_col: Column, k: int) -> Column:
    """Ordered STRING word k-grams: position i → words[i..i+k) joined
    by one space (final gram truncates; sub-k docs yield one gram of
    the whole doc) — the un-hashed twin of `_kgram_hash_array`, kept
    as one expression so string and hashed shingle consumers
    (`word_shingles`, `source_overlap(hashed=False)`) cannot drift."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(words_col) - k, F.lit(0))
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words_col, i + 1, k))
    )


def _kgram_hash_array(words_col: Column, k: int) -> Column:
    """Ordered xxhash64 per word k-gram: position i → hash of
    words[i..i+k) joined by one space (the final gram truncates; docs
    shorter than k yield one hash of the whole doc). THE hash chain —
    every shingle/MinHash/winnowing consumer derives from this single
    expression so the chains can never drift apart."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(words_col) - k, F.lit(0))
    )
    return F.transform(
        idx,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words_col, i + 1, k))),
    )


def word_shingle_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Distinct xxhash64'd word k-shingles per document: (id, shingle)
    with ``shingle`` a long — 8 bytes through every downstream
    exchange instead of the ~k-word string. The MinHash scale path;
    Jaccard over hashed shingles equals string Jaccard up to 64-bit
    collisions (~n²/2⁶⁴, negligible at any per-doc n)."""
    words = tokenize(F.col(text_col))
    src = docs.select(
        F.col(id_col).alias("id"), words.alias("w")
    ).repartition(F.col("id"))
    return src.select(
        "id",
        F.explode(
            F.array_distinct(_kgram_hash_array(F.col("w"), k))
        ).alias("shingle"),
    )


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 64, pre_hashed: bool = False
) -> DataFrame:
    """MinHash signature per id: n_hashes min-aggregates, all JVM-side,
    one shuffle on id.

    The shingle is hashed ONCE (xxhash64; skipped when the input is
    already a hash, ``pre_hashed``), then each permutation re-mixes the
    resulting long with its seed — 64 long-hash exprs per row instead
    of 64 string hashes (~8× cheaper on wide shingles).
    """
    hashed = shingles.withColumn(
        "h", F.col("shingle") if pre_hashed else F.xxhash64("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 16, n_hashes: int = 64
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b), deduplicated.

    Two docs are candidates iff one band of the signature matches
    exactly — the join key is (band_id, band_hash), so no all-pairs
    product ever materializes.
    """
    rows = n_hashes // n_bands
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias(
                "band_hash"
            ),
        )
        for b in range(n_bands)
    ])
    exploded = signatures.select(
        F.col("id"), F.explode(bands).alias("band")
    ).select("id", "band.band_id", "band.band_hash")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard ≥
    threshold).

    With ``candidates`` (e.g. from LSH) the shingle self-join is
    restricted to candidate pairs — the scale path. Without it, the
    self-join on shingle computes all co-shingled pairs exactly (the
    oracle-checkable path; bounded by shared-shingle co-occurrence).
    """
    if candidates is not None:
        # candidate-restricted path: collect each candidate doc's
        # shingle set into one array (docs are candidates on both
        # sides of some pair, so restrict with a semi-join FIRST —
        # the whole point of LSH is that this set is tiny relative to
        # the corpus), then score each pair with array_intersect.
        # No second self-join on shingle; the arrays are bounded by
        # document length, never corpus size.
        cand_ids = (
            candidates.select(F.col("id_a").alias("id"))
            .unionAll(candidates.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sets = (
            shingles.join(cand_ids, "id", "left_semi")
            .groupBy("id")
            .agg(F.collect_set("shingle").alias("shset"))
        )
        a = sets.select(
            F.col("id").alias("id_a"),
            F.col("shset").alias("set_a"),
            F.size("shset").alias("sz_a"),
        )
        b = sets.select(
            F.col("id").alias("id_b"),
            F.col("shset").alias("set_b"),
            F.size("shset").alias("sz_b"),
        )
        return (
            candidates.join(a, "id_a")
            .join(b, "id_b")
            .withColumn(
                "n_inter",
                F.size(F.array_intersect("set_a", "set_b")).cast("bigint"),
            )
            .withColumn(
                "jaccard",
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")
        )
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("sa")
    b = shingles.alias("sb")
    inter = (
        a.join(
            b,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.id") < F.col("sb.id")),
            "inner",
        )
        .groupBy(
            F.col("sa.id").alias("id_a"), F.col("sb.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def word_shingle_hash_sets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-doc distinct shingle-hash SET as one array column:
    ``(id, shset: array<long>)`` — the exchange-free shingle
    representation. Hash chain is identical to
    :func:`word_shingle_hashes` (xxhash64 of the k-word string), so
    Jaccard/MinHash results match the exploded path exactly.

    Plan shape (r13 optimization round): the parallelism exchange
    shuffles the RAW ``(id, text)`` rows and tokenization happens
    AFTER it — the pre-r13 form tokenized before the exchange, which
    (a) ran the regex split serially on the scan tasks (a single-file
    input is one task) and (b) shuffled the tokenized words array,
    strictly more bytes than the text it came from (guide §2.3/§2.5).
    The ``explode(array(·))`` Generate after the shuffle is the
    collapse barrier that materializes the words array as an
    attribute WITHOUT a second exchange: HOF lambdas re-evaluate
    non-attribute inputs (no CSE into lambdas), and generator output
    is always an attribute. Hash-partitioning on id (vs the old
    round-robin) also skips the defensive local sort every keyless
    repartition pays (``spark.sql.execution.sortBeforeRepartition``).
    """
    src = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t")
    ).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("id")
    )
    words = src.select(
        "id", F.explode(F.array(tokenize(F.col("_t")))).alias("w")
    )
    return words.select(
        "id",
        F.array_distinct(_kgram_hash_array(F.col("w"), k)).alias("shset"),
    )


_LONG_MAX = (1 << 63) - 1


def minhash_band_rows(
    sets: DataFrame, n_hashes: int = 64, n_bands: int = 16
) -> DataFrame:
    """Banded MinHash directly from per-doc shingle-hash arrays:
    ``(id, band_id, band_hash)`` — n_bands rows per doc.

    Each permutation's min is a per-row ``aggregate`` over the array
    (re-mix the 8-byte shingle hash with the seed, keep the least) —
    NO shuffle anywhere: signatures and band hashes are narrow maps,
    so the first exchange in the whole dedup pipeline is the band-key
    join. Hash chain matches :func:`minhash_signatures` exactly.
    """
    rows = n_hashes // n_bands

    def _min_under_seed(seed: int):
        # bind the permutation seed outside the lambda: pyspark infers
        # HOF arity from the signature, so a default-arg seed would be
        # mistaken for aggregate's optional 3rd (finish) parameter
        return lambda acc, h: F.least(acc, F.xxhash64(h, F.lit(seed)))

    mins = [
        F.aggregate("shset", F.lit(_LONG_MAX), _min_under_seed(i)).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    sigs = sets.select("id", *mins)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ])
    return sigs.select(F.col("id"), F.explode(bands).alias("band")).select(
        "id", "band.band_id", "band.band_hash"
    )


#: murmur3 finalizer constants + golden-ratio seed stride (public
#: constants) — the numpy-side permutation mixer for minhash_band_rows_np
_MIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: "np.ndarray") -> "np.ndarray":
    """murmur3 64-bit finalizer, vectorized (wrapping uint64)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _MIX_C1
    x ^= x >> np.uint64(33)
    x *= _MIX_C2
    x ^= x >> np.uint64(33)
    return x


def minhash_band_rows_np(
    sets: DataFrame, n_hashes: int = 64, n_bands: int = 16
) -> DataFrame:
    """`minhash_band_rows` with the signature kernel vectorized:
    ``(id, band_id, band_hash)`` from per-doc shingle-hash arrays via
    one numpy broadcast per Arrow batch (|S|×n_hashes mins, then a
    per-band fold), instead of ``n_hashes`` unrolled JVM array folds —
    the same plan shape (pure map, zero shuffle before the band join),
    ~10× the throughput, because 64 unrolled ``aggregate`` lambdas
    overflow whole-stage codegen. The permutation family is
    ``mix64(h ^ GOLDEN·(i+1))`` (murmur3 finalizer), a different —
    equally valid — hash chain from the JVM path: candidates are
    LSH-approximate either way and the exact verifier decides
    membership; recall is pinned against exact all-pairs in tests.
    """
    rows = n_hashes // n_bands
    seeds = _GOLDEN * np.arange(1, n_hashes + 1, dtype=np.uint64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def band_hashes(shsets: pd.Series) -> pd.Series:
        out = []
        for arr in shsets:
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if h.size == 0:
                h = np.zeros(1, dtype=np.uint64)
            mins = _mix64(h[:, None] ^ seeds[None, :]).min(axis=0)
            acc = np.zeros(n_bands, dtype=np.uint64)
            grouped = mins.reshape(n_bands, rows)
            for j in range(rows):
                acc = _mix64(acc ^ grouped[:, j])
            out.append(acc.view(np.int64))
        return pd.Series(out)

    return sets.select(
        F.col("id"),
        F.posexplode(band_hashes(F.col("shset"))).alias(
            "band_id", "band_hash"
        ),
    )


def bucket_pairs(
    rows: DataFrame,
    bucket_cols: list,
    member_cols: list,
    max_per_bucket: int | None = None,
    allow_unbounded: bool = False,
) -> DataFrame:
    """All ordered within-bucket member pairs:
    ``(<c>_a, <c>_b for c in member_cols)`` with pairs ordered by the
    FIRST member column (callers put the id first, giving the familiar
    ``id_a < id_b``).

    Single-exchange candidate generation (r13 optimization round) —
    replaces the bucket-key SELF-JOIN every LSH family used. The join
    shape paid twice at every scale: the bucket rows — and everything
    upstream of them, i.e. the minhash / simhash / sign-LSH signature
    UDFs — were evaluated once per join side (locally the build side
    is a BroadcastExchange over a full second evaluation; at scale a
    sort-merge join shuffles the rows twice), and the equi-join keys
    insert ``IsNotNull`` filters on UDF-derived columns that Catalyst
    pushes below the projection, re-evaluating the UDF a second time
    per side (guide §4.4's duplication — observed as FOUR
    ArrowEvalPython evaluations of the signature kernel in
    llm_simhash_candidates' pre-r13 plan). Here the rows shuffle ONCE
    (the groupBy exchange the join needed anyway), members are sorted
    per bucket, and ordered pairs are emitted by posexplode ×
    slice-explode — the member array is duplicated once per member
    (the same output volume the join's probe produced), never a
    bucket² array in a single value.

    ``max_per_bucket`` drops whole buckets above the cap AFTER the
    aggregate — the same semantics as the windowed-count valves it
    replaces (every member of a crowded bucket was dropped before the
    join), minus the window sort.

    Contract: rows with a NULL bucket key are dropped (matching the
    equi-join the callers came from); members are unique per bucket
    (one row per (id, bucket) — LSH emits exactly that).

    ``max_per_bucket=None`` additionally requires
    ``allow_unbounded=True`` (r14, r13 verdict "what's wrong #3"): an
    unbounded call materializes a whole bucket's member array in ONE
    aggregate row, so the cap is a memory-safety boundary, not just a
    skew valve. Every operator call site passes its registered valve
    parameter (``operators.valves.PRODUCTION_VALVES``) and sets the
    flag explicitly for its exactness-by-default ``None`` — a new
    caller cannot drift into unbounded use silently.
    """
    if max_per_bucket is None and not allow_unbounded:
        raise ValueError(
            "bucket_pairs: max_per_bucket=None materializes whole "
            "buckets in single aggregate rows — pass the operator's "
            "registered valve (operators.valves.PRODUCTION_VALVES) or "
            "acknowledge exact-semantics mode with allow_unbounded=True"
        )
    for c in bucket_cols:
        rows = rows.filter(F.col(c).isNotNull())
    member = F.struct(*[F.col(c) for c in member_cols])
    grouped = rows.groupBy(*bucket_cols).agg(
        F.array_sort(F.collect_list(member)).alias("_ms")
    )
    if max_per_bucket is not None:
        grouped = grouped.filter(F.size("_ms") <= max_per_bucket)
    ex = grouped.filter(F.size("_ms") >= 2).select(
        "_ms", F.posexplode("_ms").alias("_i", "_a")
    )
    pairs = ex.select(
        "_a",
        F.explode(
            F.slice(F.col("_ms"), F.col("_i") + F.lit(2), F.size("_ms"))
        ).alias("_b"),
    )
    return pairs.select(
        *[F.col(f"_a.{c}").alias(f"{c}_a") for c in member_cols],
        *[F.col(f"_b.{c}").alias(f"{c}_b") for c in member_cols],
    )


def verify_pairs_with_sets(
    sets: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over candidate pairs using per-doc shingle-hash
    arrays: two joins + array_intersect, no collect_set shuffle. The
    arrays are bounded by document length, never corpus size."""
    a = sets.select(
        F.col("id").alias("id_a"),
        F.col("shset").alias("set_a"),
        F.size("shset").alias("sz_a"),
    )
    b = sets.select(
        F.col("id").alias("id_b"),
        F.col("shset").alias("set_b"),
        F.size("shset").alias("sz_b"),
    )
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("set_a", "set_b")).cast("bigint"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def jaccard_join_prefix(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_docs_per_token: int | None = None,
) -> DataFrame:
    """EXACT all-pairs shingle Jaccard ≥ ``threshold`` via PREFIX
    FILTERING — the AllPairs/PPJoin family (Bayardo et al., "Scaling
    Up All Pairs Similarity Search", WWW 2007; Xiao et al. WWW 2008):
    ``(id_a, id_b, n_inter, sz_a, sz_b, jaccard)`` with id_a < id_b.
    The exact counterpart of `minhash_dedup_pairs`: the banded form
    trades an S-curve miss rate for fixed cost; this one has ZERO
    false negatives by construction and is the right tool when the
    threshold is high (0.8+) — prefixes shrink to (1−t)·|doc|+1
    tokens, so candidate volume collapses exactly where LSH needs the
    most bands.

    The filter: order every doc's shingles by ONE consistent global
    order — (corpus df ASC, token ASC), rarest first, the order that
    makes prefixes both small and selective — and keep only the first
    ``|s| − ceil(t·|s|) + 1`` tokens (the Jaccard prefix). Any pair
    with J ≥ t MUST share a prefix token: if not, their intersection
    lies entirely in the two suffixes, and ``|a∩b| ≤
    min(ceil(t·|a|) − 1, ceil(t·|b|) − 1) < t·max(|a|,|b|) ≤
    t·|a∪b|`` — a contradiction. Candidates then form by a
    token-keyed self-join of the PREFIXES only, with conservative
    size pruning (``J ≥ t ⇒ t·|big| ≤ |small|``, applied with
    floor/epsilon bias so float rounding can only ADMIT an extra
    candidate, never drop a true one); exact verification reuses
    `verify_pairs_with_sets`.

    Plan shape: df counts (token-keyed agg over the explode), a
    PER-DOC rank window (id-keyed — no global token rank is ever
    materialized; the (df, token) pair IS the order), the prefix
    self-join (volume Σ_tok prefix_df(tok)² — bounded by rare-first
    ordering), and the two verify joins. ``max_docs_per_token``
    is the familiar skew valve (`max_docs_per_fp` family): dropping
    prefix tokens above the cap bounds the worst bucket but FORFEITS
    exactness for pairs whose only shared prefix token was hot —
    default None keeps the zero-false-negative contract."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    sets = word_shingle_hash_sets(docs, text_col, id_col, k).persist()
    ex = sets.select(
        "id", F.size("shset").alias("sz"),
        F.explode("shset").alias("tok"),
    )
    dft = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    # epsilon biases ceil DOWN → prefix LONGER → conservative (a
    # too-short prefix is the one error that loses true pairs)
    plen = (
        F.col("sz")
        - F.ceil(F.lit(float(threshold)) * F.col("sz") - F.lit(1e-9))
        + 1
    )
    wp = Window.partitionBy("id").orderBy(
        F.col("_df").asc(), F.col("tok").asc()
    )
    prefix = (
        ex.join(dft, "tok")
        .withColumn("_pos", F.row_number().over(wp))
        .filter(F.col("_pos") <= plen)
        .select("id", "sz", "tok")
    )
    # prefix-token candidate pairs via per-bucket emission (r13 opt
    # round): one exchange on tok instead of the prefix self-join's
    # two-sided evaluation (see `bucket_pairs`); the max_docs_per_token
    # valve becomes the bucket-size cap — same drop-the-hot-token
    # semantics as the old count+semi-join, one aggregation cheaper.
    cands = (
        bucket_pairs(
            prefix,
            ["tok"],
            ["id", "sz"],
            max_per_bucket=max_docs_per_token,
            # exactness-by-default: the registered valve is
            # jaccard_join_prefix.max_docs_per_token (valves.py)
            allow_unbounded=max_docs_per_token is None,
        )
        # size pruning, float-safe by bias: floor(t·big) ≤ t·big, so
        # the test only ever ADMITS a borderline pair for verification
        .filter(
            F.least("sz_a", "sz_b")
            >= F.floor(
                F.lit(float(threshold)) * F.greatest("sz_a", "sz_b")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # persisted `sets` feeds both the prefix explode and the verify
    # joins (no unpersist on the lazy result — the
    # minhash_dedup_pairs precedent; the caller's action releases it
    # with the session's cache policy)
    return verify_pairs_with_sets(sets, cands, threshold)


def jaccard_all_pairs_from_sets(
    sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact all-co-shingled-pairs Jaccard from per-doc shingle-hash
    arrays (``word_shingle_hash_sets`` output).

    Same result as ``jaccard_pairs`` without candidates (up to 64-bit
    shingle-hash collisions), in exactly TWO exchanges: explode is only
    for pair discovery — 8-byte longs through the self-join instead of
    k-word strings — and both set sizes ride along as map-side columns
    into the pair groupBy (min-aggregated back out), so there is no
    sizes groupBy and no join back onto the pairs.

    ``sets`` is persisted here: it is consumed by BOTH sides of the
    self-join, and without the cache barrier CollapseProject inlines
    the whole shingling chain into size() and explode() on each side —
    shingling every document four times instead of once.
    """
    sets = sets.persist()
    ex = sets.select(
        "id", F.size("shset").alias("sz"), F.explode("shset").alias("h")
    )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min("a.sz").alias("sz_a"),
            F.min("b.sz").alias("sz_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    k: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    max_docs_per_band: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-verified.

    LSH proposes candidates (banded buckets only), exact Jaccard over
    shingle-hash sets confirms ≥ threshold. This is the operator a
    100 TB dedup run uses end-to-end.

    Shape: shingle sets stay per-row arrays (no explode), signatures
    and band hashes are narrow maps over them (numpy-vectorized — see
    `minhash_band_rows_np`), so the ONLY exchanges in the plan are the
    band-key self-join and the two candidate-pair verify joins —
    everything before that is map-side. The set array feeds both the
    band path and the verify join, so it is persisted (at cluster
    scale this is the one intermediate worth materializing —
    everything downstream is a reduction of it).

    ``max_docs_per_band`` is the boilerplate-skew valve (the band-join
    twin of winnowing's ``max_docs_per_fp``): candidate volume is
    Σ bucket² over band buckets, and a template shared by a million
    docs makes ONE bucket contribute 10¹² pairs while telling you
    nothing pairwise-specific. Buckets above the cap are dropped
    before the self-join (one extra narrow aggregation on the same
    shuffle key). Recall contract: any pair sharing a *non-crowded*
    band is still found; members of a dropped mega-bucket can only
    pair through their other ``n_bands − 1`` bands — near-identical
    docs (the ones a mega-cluster is made of) agree on almost every
    band, so in practice a crowd is found through its quieter bands
    or deliberately left to a dedicated template-dedup pass. Default
    None preserves exact candidate semantics (the oracle-pinned
    configuration); production pipelines should set the recommended
    cap in `operators.valves.PRODUCTION_VALVES`."""
    sets = word_shingle_hash_sets(docs, text_col, id_col, k).persist()
    bands = minhash_band_rows_np(sets, n_hashes, n_bands)
    # candidate generation via per-bucket pair emission (r13 opt
    # round): one exchange on the band key and ONE evaluation of the
    # numpy signature kernel, vs the band-key self-join that evaluated
    # the ArrowEvalPython band UDF once per join side (see
    # `bucket_pairs`). Candidate set is identical: pairs sharing ≥1
    # band bucket, id_a < id_b, distinct.
    cands = (
        bucket_pairs(
            bands,
            ["band_id", "band_hash"],
            ["id"],
            max_per_bucket=max_docs_per_band,
            # exactness-by-default: the registered valve is
            # minhash_dedup_pairs.max_docs_per_band (valves.py)
            allow_unbounded=max_docs_per_band is None,
        )
        .distinct()
    )
    return verify_pairs_with_sets(sets, cands, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc: per-bit majority vote over token hashes.

    Token hashes are JVM ``xxhash64`` (the chain is unchanged from the
    original explode/groupBy formulation, so existing signatures are
    bit-identical); the per-bit majority vote is one numpy reduction
    per Arrow batch over the per-doc hash ARRAY — a pure map with zero
    shuffles, replacing an explode + 64-conditional-sum groupBy (64
    unrolled aggregate expressions are the codegen-hostile shape; see
    `minhash_band_rows_np`). Empty/whitespace-only/NULL docs are
    floored to a single empty token so they keep a signature (all of
    them the same one — mutual near-dups, the right call for
    content-free documents) instead of vanishing — or, for NULL text,
    crashing the numpy kernel.
    """
    # r13 opt round: repartition the RAW (id, text) rows, tokenize
    # after the exchange behind an explode(array(·)) Generate barrier
    # — the pre-r13 form ran the whole tokenize+hash+signature chain
    # on the scan tasks (serial for a single-file input), and the
    # empty-doc floor's CASE WHEN re-evaluated the tokenize regex
    # three times per row (isnull test, size test, else branch)
    # because `toks` was not an attribute. Same values, same hash
    # chain — one tokenize per row, spread across every core.
    src = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t")
    ).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("id")
    )
    words = src.select(
        "id", F.explode(F.array(tokenize(F.col("_t")))).alias("w")
    )
    # size(NULL) is -1/NULL, so test <= 0 AND the array itself
    toks = F.when(
        F.col("w").isNull() | (F.size("w") <= 0), F.array(F.lit(""))
    ).otherwise(F.col("w"))
    hashed = words.select(
        "id",
        F.transform(toks, lambda t: F.xxhash64(t)).alias("hs"),
    )

    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(n_bits, dtype=np.uint64)

    @pandas_udf("long")
    def sig(hs: pd.Series) -> pd.Series:
        out = np.zeros(len(hs), dtype=np.uint64)
        for row, arr in enumerate(hs):
            if arr is None:  # belt-and-braces with the floor above
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if h.size == 0:
                continue
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[row] = ((votes > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64
            )
        return pd.Series(out.view(np.int64))

    return hashed.select("id", sig(F.col("hs")).alias("simhash"))


def simhash_candidate_pairs(
    signatures: DataFrame,
    n_chunks: int = 4,
    max_docs_per_chunk: int | None = None,
) -> DataFrame:
    """Pairs sharing ≥1 of ``n_chunks`` 16-bit chunks — by pigeonhole,
    catches every pair within Hamming distance n_chunks-1.

    ``max_docs_per_chunk`` (r14, closing the r13 verdict's
    "what's wrong #3" — this was the one bucket_pairs caller with no
    valve): chunk buckets above the cap are excluded from pairing —
    the standard degenerate-crowd judgment (a 16-bit chunk value
    shared by >10k docs is boilerplate, which exact dedup catches
    outright). Default ``None`` keeps exact semantics per the valves
    doctrine; the recommended production cap is registered as
    ``simhash_candidate_pairs.max_docs_per_chunk``."""
    width = 64 // n_chunks
    chunks = F.array(*[
        F.struct(
            F.lit(c).alias("chunk_id"),
            F.expr(f"(simhash >> {c * width}) & {(1 << width) - 1}").alias(
                "chunk_val"
            ),
        )
        for c in range(n_chunks)
    ])
    # NULL signatures can never pair (the old equi-join's chunk_val
    # keys dropped them); the explicit filter keeps that contract now
    # that candidates come from a groupBy (r13 opt round — see
    # `bucket_pairs`: one exchange on the chunk key and ONE evaluation
    # of the signature subtree, vs the self-join that evaluated the
    # ArrowEvalPython sig UDF FOUR times: twice per side via the §4.4
    # IsNotNull-pushdown duplication).
    e = signatures.filter(F.col("simhash").isNotNull()).select(
        "id", "simhash", F.explode(chunks).alias("c")
    ).select("id", "simhash", "c.chunk_id", "c.chunk_val")
    pairs = (
        bucket_pairs(
            e,
            ["chunk_id", "chunk_val"],
            ["id", "simhash"],
            max_per_bucket=max_docs_per_chunk,
            allow_unbounded=max_docs_per_chunk is None,
        )
        .select(
            "id_a",
            "id_b",
            F.col("simhash_a").alias("sig_a"),
            F.col("simhash_b").alias("sig_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    )


# ---------------------------------------------------------------------------
# Duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def _checkpointer(df_session, use_reliable_checkpoint: bool):
    """Shared round-state truncation policy for the iterative CC
    algorithms: localCheckpoint (fast, dies with an executor) vs
    checkpoint into the configured reliable dir (multi-node)."""
    if use_reliable_checkpoint:
        sc = df_session.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "use_reliable_checkpoint=True requires a checkpoint "
                "directory: call "
                "spark.sparkContext.setCheckpointDir(<hdfs/s3 path>) "
                "first (localCheckpoint would silently lose round "
                "state on executor loss)"
            )
        return lambda df: df.checkpoint(eager=False)
    # eager=False (r13 opt round): every CC round follows its
    # checkpoint with a convergence aggregate, so the lazy checkpoint
    # materializes inside that aggregate's job — one Spark job per
    # round instead of two (materialize + collect), same truncation.
    return lambda df: df.localCheckpoint(eager=False)


def duplicate_clusters_star(
    pairs: DataFrame,
    max_iter: int = 25,
    use_reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — same ``(id, cluster_id)`` contract as
    ``duplicate_clusters``, but rounds scale with log(diameter), not
    diameter.

    Use this when components can be DEEP CHAINS (transitive near-dup
    runs, crawl-mirror link chains): min-label propagation needs one
    round per hop of the longest path, star contraction halves path
    depth every round pair. For the shallow LSH-clique components the
    registered dedup queries produce, label propagation's single
    cheaper shuffle per round wins — which is why it stays the
    default.

    Per round pair, both steps are one groupBy + one join on node id:

    - large-star: every node connects its LARGER neighbors to its
      minimum neighborhood member (keeps edges pointing big→small);
    - small-star: every node connects its smaller neighbors (and
      itself) to the minimum — stars collapse onto component minima.

    Convergence = the directed edge set is unchanged (count + xxhash64
    sum: two driver scalars per round, never a collect). At the fixed
    point edges are exactly (node, component-min) stars; isolated ids
    and the roots themselves label as their own cluster.
    """
    ckpt = _checkpointer(pairs.sparkSession, use_reliable_checkpoint)

    # all ids BEFORE self-pair filtering: an id appearing only in a
    # self-pair is still a (singleton) node and must get a label, same
    # as duplicate_clusters
    all_ids = ckpt(
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # big→small canonical direction; drop self-pairs defensively
    e0 = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"),
            F.least("id_a", "id_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select(
            "u", F.least("mn", F.col("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # invariant: every edge has v < u (large-star emits min-links)
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        moved = (
            e.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return (
            moved.unionAll(
                mins.select("u", F.col("m").alias("v"))
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    edges = ckpt(e0)
    fp = _fingerprint(edges)
    for _ in range(max_iter):
        new_edges = ckpt(_small_star(_large_star(edges)))
        new_fp = _fingerprint(new_edges)
        edges = new_edges
        if new_fp == fp:
            break
        fp = new_fp

    # min-aggregate the parent: at the fixed point every child has
    # exactly one parent, but a max_iter exhaustion mid-contraction can
    # leave a node pointing at two minima — the contract is one row per
    # id with the best label seen, matching duplicate_clusters'
    # degrade-gracefully behavior, never duplicate rows
    roots = edges.groupBy(F.col("u").alias("id")).agg(
        F.min("v").alias("root")
    )
    return all_ids.join(roots, "id", "left").select(
        "id", F.coalesce("root", F.col("id")).alias("cluster_id")
    )


def duplicate_clusters(
    pairs: DataFrame,
    max_iter: int = 25,
    use_reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components over duplicate pairs: ``(id, cluster_id)``
    with ``cluster_id`` the minimum doc id in the component — the step
    that turns pair output (MinHash/SimHash/Jaccard) into a keep/drop
    decision: keep ``id == cluster_id``, drop the rest.

    Iterative min-label propagation: each round every node takes the
    least label among itself and its neighbors (one shuffle on id per
    round, all JVM). Rounds needed = component diameter; near-dup
    components are LSH-bucket cliques or short chains, so 2-4 rounds
    in practice. Convergence is detected by the total-label sum — a
    strictly decreasing bigint-safe decimal — so the driver reads ONE
    scalar per round and never collects labels. Each round's labels
    are ``localCheckpoint``ed: the round body references the previous
    labels TWICE (union + neighbor join), so without truncation the
    logical plan doubles per round — caching alone does not cut
    lineage, and ~15 rounds is enough to OOM the planner.

    Checkpoint mode: ``localCheckpoint`` (default) keeps round state
    on executor block storage — fastest, but it does NOT survive
    executor loss, which on a real cluster kills the job mid-
    iteration. Pass ``use_reliable_checkpoint=True`` on multi-node
    deployments: rounds then go through ``.checkpoint()`` into the
    session's configured checkpoint directory
    (``spark.sparkContext.setCheckpointDir`` — validated up front so
    the failure is a clear message, not round-N lineage loss).

    At 100 TB this is the published MapReduce-CC shape (label
    propagation). Rounds scale with component DIAMETER — for deep
    chains use ``duplicate_clusters_star`` (same contract,
    log-diameter rounds via star contraction); for the shallow
    LSH-clique components dedup actually produces, this one shuffle
    per round is cheaper.
    """
    _ckpt = _checkpointer(pairs.sparkSession, use_reliable_checkpoint)

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .persist()
    )
    # NOTE on width: the dup-pair graph is orders of magnitude smaller
    # than the corpus that produced it, and AQE's partition coalescing
    # right-sizes each round's shuffle to the actual graph volume — an
    # explicit count+repartition here was measured SLOWER (extra jobs
    # outweigh the savings AQE already delivers).
    # fused round-1 initialization (r13 opt round): with labels0 = id,
    # the first propagation round's neighbor join is the identity
    # (every neighbor's label IS its id), so round 1 reduces to
    # min-over-neighborhood — computable straight off the edge list as
    # one groupBy, no join, and it subsumes the old distinct-ids
    # labels0 exchange too. Label propagation is monotone, so starting
    # the loop from labels1 converges to the same fixed point one
    # join-bearing Spark job earlier.
    labels = _ckpt(
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select("id", F.least(F.col("id"), F.col("_mn")).alias("lbl"))
    )
    total = labels.agg(
        F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for _ in range(max_iter):
        nbr = edges.join(
            labels, edges["dst"] == labels["id"], "inner"
        ).select(F.col("src").alias("id"), F.col("lbl"))
        new_labels = _ckpt(
            labels.unionAll(nbr).groupBy("id").agg(F.min("lbl").alias("lbl"))
        )
        new_total = new_labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if new_total == total:
            break
        total = new_total
    edges.unpersist()
    return labels.select("id", F.col("lbl").alias("cluster_id"))


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a held-out corpus)
# ---------------------------------------------------------------------------


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Training-set decontamination: per-document count of word
    k-shingles shared with a benchmark corpus —
    ``(id, n_overlap, n_shingles, overlap_frac)``, contaminated docs
    only (``n_overlap >= 1``).

    The benchmark's distinct shingle-hash set is broadcast (benchmarks
    are MB-scale against a TB-scale corpus), so the corpus side never
    shuffles for the probe: explode → broadcast-hash semi-probe →
    re-aggregate on the already-partitioned id. Matching on xxhash64'd
    shingles equals string matching up to 64-bit collisions.
    """
    # persist: shset is referenced twice below (size + explode) and
    # CollapseProject would otherwise inline the whole shingling chain
    # into both, shingling every document twice
    doc_sets = word_shingle_hash_sets(docs, text_col, id_col, k).persist()
    bench_shingles = (
        word_shingle_hash_sets(benchmark, text_col, id_col, k)
        .select(F.explode("shset").alias("h"))
        .distinct()
    )
    ex = doc_sets.select(
        "id", F.size("shset").alias("sz"), F.explode("shset").alias("h")
    )
    return (
        ex.join(F.broadcast(bench_shingles), "h", "inner")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.min("sz").alias("n_shingles"),
        )
        .withColumn(
            "overlap_frac", F.col("n_overlap") / F.col("n_shingles")
        )
    )


def source_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    hashed: bool = True,
    max_sources_per_shingle: int | None = None,
) -> DataFrame:
    """Cross-SOURCE k-shingle contamination matrix — one row per
    unordered source pair: ``(source_a, source_b, n_shared,
    jaccard)`` with ``n_shared`` the count of DISTINCT shingles both
    sources contain and ``jaccard`` the shingle-set Jaccard (6 dp).
    The mixture-design report `benchmark_contamination` cannot give:
    that operator probes docs against ONE benchmark; this measures
    every source against every other, which is what decides whether
    two crawls/dumps are near-copies before their mixture weights are
    set (a CommonCrawl snapshot and a web-dump that share half their
    shingles should not both enter at full weight).

    Plan: per-doc distinct grams map-side (`_kgram_hash_array` /
    `_kgram_string_array` — array_distinct before the explode), ONE
    distinct on (source, shingle), then the shingle-keyed self-join.
    Pair volume per shingle is (sources containing it)², bounded by
    the source count squared — never corpus²; per-source totals ride
    back in as a broadcast |sources|-row side. ``hashed=True`` (the
    scale default) moves 8-byte longs through both shuffles instead
    of k-word strings; counts equal string counts up to 64-bit
    collisions (the `word_shingle_hashes` bound)."""
    words = tokenize(F.col(text_col))
    src = docs.select(
        F.col(group_col).alias("src"),
        F.col(id_col).alias("id"),
        words.alias("w"),
        # id-keyed repartition: the word_shingles materialization
        # barrier (lambda inputs re-evaluate without it) with even
        # distribution — NOT src-keyed, which would skew to |sources|
        # partitions
    ).repartition(F.col("id"))
    gram = (
        _kgram_hash_array(F.col("w"), k)
        if hashed
        else _kgram_string_array(F.col("w"), k)
    )
    sh = (
        src.select(
            "src", F.explode(F.array_distinct(gram)).alias("sh")
        )
        .distinct()
        .persist()  # feeds per-source totals AND both join legs
    )
    if max_sources_per_shingle is not None:
        # the valve (the max_df_ratio family): a shingle present in
        # nearly EVERY source is a stopword-gram — it carries no
        # between-source signal yet drives the worst-case pair volume
        # (S² rows per shingle). Valved shingles leave the measured
        # UNIVERSE, not just the join: per-source totals shrink with
        # them, so jaccard stays a true set Jaccard over the valved
        # shingle universe (the semantics an analyst can reason about)
        sh = sh.join(
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_ns"))
            .filter(F.col("_ns") <= max_sources_per_shingle)
            .select("sh"),
            "sh",
            "left_semi",
        )
    per = sh.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        sh.select(F.col("src").alias("source_a"), "sh")
        .join(sh.select(F.col("src").alias("source_b"), "sh"), "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(
                per.select(
                    F.col("src").alias("source_a"),
                    F.col("n").alias("_na"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                per.select(
                    F.col("src").alias("source_b"),
                    F.col("n").alias("_nb"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_na") + F.col("_nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup: persisted MinHash band index for batch-vs-corpus
# ---------------------------------------------------------------------------

#: contract marker for a persisted MinHash index — the band hash chain
#: is (k, n_hashes, n_bands)-sensitive, so probing with different
#: parameters silently proposes zero candidates; the marker makes the
#: parameters travel with the data (same rationale as
#: sinks.LAYOUT_META_FILE for bucketed layouts)
INDEX_META_FILE = "_minhash_index.json"


def _index_meta_path(path: str) -> str:
    import os as _os

    return _os.path.join(path, INDEX_META_FILE)


def write_minhash_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
) -> None:
    """Persist the corpus dedup index: ``bands/`` (id, band_id,
    band_hash — the LSH probe surface) and ``sets/`` (id, shset — the
    exact-verify surface), under a manifest-committed version
    directory that also carries the parameter contract.

    This is what makes daily dedup INCREMENTAL at 100 TB: the corpus
    is shingled and banded ONCE; each day's batch is banded map-side
    and joined against the stored bands — new-batch cost is
    O(|batch| + candidates), never O(|corpus|) recompute. Size: bands
    are n_bands × ~24 B/doc; sets are the shingle arrays (the larger
    surface — at full scale lay both out id-bucketed/sorted so the
    verify join co-locates without a shuffle of the corpus side).

    A REBUILD is a pointer flip, never in-place: the new bands+sets
    land in a fresh ``versions/v<n>-<uuid>/`` directory and become
    visible only when ``_manifests/manifest-<n>.json`` is published
    via create-if-absent (`sources.manifest.VersionedManifest` — the
    same commit protocol as the streaming txn store). A crash anywhere
    mid-rebuild leaves the OLD index live and probes answering; at
    100 TB a rebuild is days of compute and must never destroy the
    state it is replacing. Superseded versions are reclaimed by
    `vacuum_minhash_index`. Pre-manifest indexes (marker file +
    bands/sets at the root) stay readable through the legacy fallback
    in `_resolve_minhash_index`.
    """
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.manifest import VersionedManifest

    spark = docs.sparkSession
    vm = VersionedManifest(path)
    version = vm.latest_version(spark)
    rel = _pp.join("versions", f"v{version + 1}-{_uuid.uuid4().hex[:8]}")
    vroot = _pp.join(path, rel)
    sets = word_shingle_hash_sets(docs, text_col, id_col, k).persist()
    bands = minhash_band_rows_np(sets, n_hashes, n_bands)
    # batch=<token> subdirectory layout from day 0 (appends add more
    # batch dirs with per-batch overwrite — the idempotency mechanism;
    # see append_minhash_index)
    from ..sources.fs import require_success_marker

    bands.write.mode("errorifexists").parquet(
        _pp.join(vroot, "bands", "batch=base")
    )
    sets.write.mode("errorifexists").parquet(
        _pp.join(vroot, "sets", "batch=base")
    )
    sets.unpersist()
    # marker-less committers are rejected at the FIRST write so a
    # later compaction never misreads the base as a torn commit —
    # checked on BOTH sides (compaction completeness requires markers
    # on both; a committer dropping them per-output rather than
    # cluster-wide would otherwise pass here and trip only at compact
    # time, misdiagnosed as a torn commit)
    require_success_marker(
        spark, _pp.join(vroot, "bands", "batch=base"), "MinHash index build"
    )
    require_success_marker(
        spark, _pp.join(vroot, "sets", "batch=base"), "MinHash index build"
    )
    vm.publish_or_raise(
        spark,
        {
            "current": rel,
            "k": k,
            "n_hashes": n_hashes,
            "n_bands": n_bands,
            "layout": "batch-v1",
        },
        version,
        "MinHash index rebuild",
    )


def _legacy_minhash_meta(spark, path: str) -> dict:
    """Parameter contract of a PRE-MANIFEST index (marker file beside
    root-level bands/sets). Missing or unparseable markers RAISE:
    probing with guessed parameters returns silently-empty candidates,
    which at dedup time means duplicates sail through."""
    import json as _json

    from ..sources.fs import read_text

    raw = read_text(spark, _index_meta_path(path))
    if raw is None:
        raise ValueError(
            f"no MinHash index marker at {_index_meta_path(path)} (and "
            "no _manifests/) — not an index directory, or written by a "
            "pre-marker tool"
        )
    try:
        meta = _json.loads(raw)
        parsed = {
            "k": int(meta["k"]),
            "n_hashes": int(meta["n_hashes"]),
            "n_bands": int(meta["n_bands"]),
        }
        layout = meta.get("layout")
    except (ValueError, KeyError, TypeError) as exc:
        raise ValueError(
            f"corrupt MinHash index marker at {_index_meta_path(path)}: "
            f"{raw!r}"
        ) from exc
    if layout != "batch-v1":
        # markers without a layout key can be either a pre-batch FLAT
        # index (incompatible: appending batch= dirs beside flat part
        # files makes partition discovery fail with an opaque
        # 'conflicting directory structures' error) or an early
        # batch-layout index that simply predates the key — the dirs
        # disambiguate
        import os as _os

        from ..sources.fs import glob_paths

        if layout is None and glob_paths(
            spark, _os.path.join(path, "bands", "batch=*")
        ):
            return parsed  # batch layout, pre-versioning marker — fine
        raise ValueError(
            f"MinHash index at {path} uses layout {layout!r} (flat "
            "part files), this code expects 'batch-v1' — rebuild with "
            "write_minhash_index"
        )
    return parsed


def _minhash_meta_from_payload(
    version: int, payload: dict, path: str
) -> tuple[dict, str]:
    """(parameter contract, data root) from a resolved manifest payload
    — shared by the probe resolver and the append fold so each pays
    exactly one manifest round-trip (the IVF index has the same
    split)."""
    import posixpath as _pp

    try:
        meta = {
            "k": int(payload["k"]),
            "n_hashes": int(payload["n_hashes"]),
            "n_bands": int(payload["n_bands"]),
        }
        current = str(payload["current"])
    except (ValueError, KeyError, TypeError) as exc:
        raise ValueError(
            f"corrupt MinHash index manifest version {version} "
            f"under {path}: {payload!r}"
        ) from exc
    return meta, _pp.join(path, current)


def _resolve_minhash_index(spark, path: str) -> tuple[dict, str]:
    """(parameter contract, data root) — manifest-committed layout
    first (the ``versions/`` dir the latest manifest references),
    pre-manifest marker layout (bands/sets at the index root) as the
    fallback."""
    from ..sources.manifest import VersionedManifest

    version, payload = VersionedManifest(path).resolve(spark)
    if payload is not None:
        return _minhash_meta_from_payload(version, payload, path)
    return _legacy_minhash_meta(spark, path), path


def read_minhash_index_meta(spark, path: str) -> dict:
    """The index parameter contract (manifest-first, legacy-marker
    fallback); missing or corrupt indexes raise."""
    return _resolve_minhash_index(spark, path)[0]


def compact_minhash_index(
    spark, path: str, folded_retention: int | None = None
) -> bool:
    """Fold every COMPLETE ``batch=`` directory of the current index
    version into a single ``batch=base`` under a NEW manifest-committed
    version — probe read cost grows with directories-per-side between
    compactions (each batch append adds one bands dir and one sets dir
    to every probe's scan list), and this resets it to one.

    Completeness is judged per token by the ``_SUCCESS`` markers on
    BOTH sides (one listing per side, no per-token probes): the marker
    is written strictly AFTER every commitJob rename, so it is the one
    signal that cannot be present over partial data — part files alone
    prove a commit STARTED, not that it finished (v1 commitJob merges
    task outputs sequentially; a driver crash mid-merge leaves a
    subset of final-named files). Folding a half-written batch would
    bake partial rows into ``batch=base`` permanently, and the
    same-token replay would then DUPLICATE them. Three token states:

    - marked on both sides → folded;
    - a side has data files but no marker (torn commit) → the whole
      compaction REFUSES loudly, naming the tokens — restart the
      ingest so the same-token replay completes the fold, or remove
      the torn directory (marker-less committers cannot produce these
      through this engine: the build, fold, AND compaction writers all
      validate the marker landed at write time);
    - anything else (side missing or empty — the designed append
      crash window) → skipped silently, merely unindexed in the new
      version until the replay re-folds it whole.

    The published payload records every ingest token ever folded into
    a base (``folded``, cumulative across compactions) and
    `append_minhash_index` no-ops for tokens on that list. This closes
    the replay-after-compaction duplication window: an ingest that
    crashes after a fold's markers land but BEFORE its stream marker
    commits will, on restart, replay that batch — and if a compaction
    ran in between, the fold's rows are already baked into the new
    version's ``batch=base`` while the new version's empty batch dir
    makes the markers-exist no-op guard pass, so without the list the
    replay would re-append the rows and duplicate every candidate
    pair they produce downstream. The list grows with total tokens
    ever compacted (a few bytes each — manifest stays KB at any
    realistic ingest cadence).

    ``folded_retention`` bounds that growth: the published list keeps
    only the MOST RECENT ``folded_retention`` tokens in fold order
    (oldest pruned first; the list is stored in fold order for exactly
    this reason). Pruning is safe at any retention ≥ the number of
    streams folding into this index, because only a stream's LAST
    batch can ever legitimately replay: earlier batch ids are refused
    LOUDLY by the stream's replay marker (``streaming.ingest`` raises
    on ``batch_id < last_batch_id``) before the index is touched, so
    a pruned token can only come back through a direct
    `append_minhash_index` call that reuses a historical token —
    outside the stable-token contract (ad-hoc callers get fresh
    UUIDs). Default ``None`` keeps the exact unbounded behavior.

    Same pointer-flip guarantees as `write_minhash_index`: the old
    version stays live until the manifest publishes; a crash leaves it
    untouched; `vacuum_minhash_index` reclaims it afterwards. Returns
    False on a legacy (pre-manifest) index — rebuild first. Single
    writer per index, as everywhere in this family."""
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.fs import glob_paths, require_success_marker
    from ..sources.manifest import VersionedManifest

    vm = VersionedManifest(path)
    version, payload = vm.resolve(spark)
    if payload is None:
        return False
    old_root = _pp.join(path, str(payload["current"]))

    def _glob_tokens(side: str, leaf: str) -> set[str]:
        # ONE listing per side (never per-token exists() probes)
        return {
            p.rsplit("batch=", 1)[1].split("/", 1)[0]
            for p in glob_paths(
                spark, _pp.join(old_root, side, "batch=*", leaf)
            )
        }

    marked_bands = _glob_tokens("bands", "_SUCCESS")
    marked_sets = _glob_tokens("sets", "_SUCCESS")
    marked = marked_bands & marked_sets
    torn = sorted(
        (_glob_tokens("bands", "part-*") - marked_bands)
        | (_glob_tokens("sets", "part-*") - marked_sets)
    )
    if torn:
        raise RuntimeError(
            f"MinHash index at {path}: batch dirs {torn} hold data "
            "files without a _SUCCESS marker — a torn job commit. "
            "Folding them could bake partial rows into the compacted "
            "base and the same-token replay would duplicate them. "
            "Restart the ingest so the replay completes these folds, "
            "or remove the torn directories, then compact."
        )
    # tombstone completeness mirrors the two-sided rule: probes skip a
    # torn delete (replay heals it), but a compaction that ignored one
    # would publish a base resurrecting the docs it meant to drop
    t_marked = _glob_tokens("tombstones", "_SUCCESS")
    t_torn = sorted(_glob_tokens("tombstones", "part-*") - t_marked)
    if t_torn:
        raise RuntimeError(
            f"MinHash index at {path}: tombstone batch dirs {t_torn} "
            "hold data files without a _SUCCESS marker — a torn "
            "delete commit. Re-run the same-token delete to complete "
            "it, or remove the torn directories, then compact."
        )
    complete = sorted(marked)
    if not complete:
        return False  # nothing durable to fold
    tombs = (
        _minhash_tombstone_ids(spark, old_root) if t_marked else None
    )
    rel = _pp.join("versions", f"v{version + 1}-{_uuid.uuid4().hex[:8]}")
    vroot = _pp.join(path, rel)
    # read drops the batch= partition column; the rewrite is one
    # file-consolidating pass per side, no shuffle semantics involved
    # (tombstones, when present, anti-join BOTH sides here — applied
    # physically, and the new version starts with none)
    for side, cols in (("bands", ["id", "band_id", "band_hash"]),
                       ("sets", ["id", "shset"])):
        dirs = [
            _pp.join(old_root, side, f"batch={t}") for t in complete
        ]
        folded_side = spark.read.parquet(*dirs).select(*cols)
        if tombs is not None:
            folded_side = folded_side.join(tombs, "id", "left_anti")
        folded_side.write.mode("errorifexists").parquet(
            _pp.join(vroot, side, "batch=base")
        )
        require_success_marker(
            spark,
            _pp.join(vroot, side, "batch=base"),
            "MinHash index compaction",
        )
    folded = _fold_token_list(
        payload.get("folded", ()), complete, folded_retention
    )
    # applied tombstone tokens are durable in their OWN list — see
    # similarity.compact_ivf_index for the namespace-collision rationale
    folded_del = _fold_token_list(
        payload.get("folded_deletes", ()), sorted(t_marked),
        folded_retention,
    )
    if not vm.publish(
        spark,
        {
            **payload,
            "current": rel,
            "folded": folded,
            "folded_deletes": folded_del,
        },
        version,
    ):
        # a fold's version bump (or a rebuild) landed between this
        # compaction's batch listing and its commit — publishing anyway
        # would ship a version that silently omits the new batch. The
        # old version stays live, this compaction's directory is
        # vacuumable garbage; re-run to pick the new batch up.
        raise RuntimeError(
            f"MinHash index compaction at {path} lost the manifest "
            f"race for version {version + 1}: a concurrent fold or "
            "rebuild committed first. Nothing is lost — the previous "
            "version remains live; re-run the compaction."
        )
    return True


def _fold_token_list(
    prev, complete, retention: int | None
) -> list[str]:
    """Fold-order token list: prior entries keep their order, newly
    folded tokens append (sorted among themselves for determinism),
    ``base`` never appears, and ``retention`` keeps only the newest N
    (see `compact_minhash_index` for why pruning old tokens is safe)."""
    if retention is not None and retention < 1:
        raise ValueError(f"folded_retention must be >= 1: {retention}")
    kept = [t for t in prev if t != "base"]
    seen = set(kept)
    kept += sorted(t for t in set(complete) - seen if t != "base")
    return kept[-retention:] if retention is not None else kept


def minhash_index_stats(spark, path: str) -> DataFrame:
    """One-row operational health summary of a persisted MinHash
    index — the band-join twin of `similarity.ivf_index_stats`:
    ``(n_docs, n_batches, max_bucket, p95_bucket, mean_bucket,
    n_tombstones)`` from one bounded aggregation pass over ``bands/``
    (group by band bucket with map-side partial counts, then a scalar
    fold — never the sets surface, which is the big one) plus one
    scalar tombstone count (``n_docs`` stays PHYSICAL — tombstoned ids
    count until compaction applies the deletes).

    What an operator reads off it at 100 TB: the probe/candidate cost
    of every `dedup_against_index` batch is Σ(bucket·|batch-side
    bucket|) — ``max_bucket`` against the ``max_docs_per_band``
    production valve is the boilerplate-crowd early warning (a
    shared header/footer collapsing thousands of docs into one band
    bucket), and ``p95_bucket``/``mean_bucket`` say whether that max
    is one pathological crowd (vacuum it with an exact-dedup pass)
    or a systemically hot banding (re-band with more bits);
    ``n_batches`` is the `compact_minhash_index` watermark, exactly
    as on the IVF side.
    """
    import posixpath as _pp

    _, data_root = _resolve_minhash_index(spark, path)
    bands = spark.read.parquet(_pp.join(data_root, "bands"))
    occupancy = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("_n")
    )
    bucket_stats = occupancy.agg(
        F.max("_n").alias("max_bucket"),
        F.expr("approx_percentile(_n, 0.95)").alias("p95_bucket"),
        F.round(F.avg("_n"), 3).alias("mean_bucket"),
    )
    totals = bands.agg(
        F.countDistinct("id").alias("n_docs"),
        F.countDistinct("batch").alias("n_batches"),
    )
    # delete debt (`delete_from_minhash_index`): tombstoned docs still
    # pay the probe-side anti-join and their bands/sets bytes until
    # compaction applies them — the maintain watermark reads this
    # DISTINCT ids: a worklist replayed under fresh tokens re-writes
    # the same ids, and raw row counts would inflate the debt
    # watermark into no-op full-rewrite compactions
    tombs = _minhash_tombstone_ids(spark, data_root)
    n_tombstones = (
        tombs.agg(F.countDistinct("id").alias("n_tombstones"))
        if tombs is not None
        else spark.range(1).select(
            F.lit(0).cast("long").alias("n_tombstones")
        )
    )
    # 1-row aggregates — the crossJoins broadcast one row each
    return totals.crossJoin(bucket_stats).crossJoin(n_tombstones)


def maintain_minhash_index(
    spark,
    path: str,
    max_batches: int = 8,
    max_bucket_watermark: int | None = None,
    folded_retention: int | None = None,
    vacuum: bool = False,
    max_tombstone_ratio: float = 0.2,
) -> dict:
    """The scheduled maintenance job over `minhash_index_stats` — the
    band-join twin of `similarity.maintain_ivf_index`, acting on the
    two watermarks the stats docstring names:

    - **fold fragmentation**: ``n_batches > max_batches`` runs
      `compact_minhash_index` (each append adds one bands dir + one
      sets dir to every probe's scan list; the fold resets it to
      one). A lost manifest race is reported, not raised — for a
      scheduled job "someone else just folded" is success-shaped —
      while a torn-commit refusal still propagates (it needs an
      operator, not a retry).
    - **bucket crowding**: ``max_bucket`` above
      ``max_bucket_watermark`` (default: the
      `valves.PRODUCTION_VALVES` ``max_docs_per_band`` cap, so the
      alert fires exactly where the probe-side valve would start
      truncating candidates) flags ``crowd_flagged``. Whether the
      crowd is one boilerplate cluster (``p95_bucket`` small — run
      exact dedup on it) or a systemically hot banding
      (``p95_bucket`` near ``max_bucket`` — re-band with more bits)
      is a human/pipeline decision; the report carries both numbers.

    - **tombstone debt**: pending deletes
      (`delete_from_minhash_index`) past ``max_tombstone_ratio`` ×
      ``n_docs`` fire the compaction too — until applied physically,
      every probe pays the tombstone anti-join and the deleted docs'
      bands/sets bytes.

    ``vacuum=True`` reclaims superseded versions via
    `vacuum_minhash_index` after a successful compaction — same
    timing caveat as `similarity.maintain_ivf_index` (default False;
    probes draining the old version must finish first).

    Driver cost: one bounded stats aggregation (1 row collected).
    """
    from . import valves

    if max_bucket_watermark is None:
        max_bucket_watermark = valves.recommended(
            "minhash_dedup_pairs", "max_docs_per_band"
        )
    row = minhash_index_stats(spark, path).collect()[0]
    report = {
        "n_docs": row["n_docs"],
        "n_batches": row["n_batches"],
        "max_bucket": row["max_bucket"],
        "p95_bucket": row["p95_bucket"],
        "mean_bucket": row["mean_bucket"],
        "n_tombstones": row["n_tombstones"],
        "compacted": False,
        "compaction_race_lost": False,
        "crowd_flagged": row["max_bucket"] > max_bucket_watermark,
    }
    # delete-debt watermark (the IVF/BM25 twin): pending tombstones
    # past the ratio fire the compaction even below the fragmentation
    # watermark — until applied, every probe pays the anti-join and
    # the deleted docs' bands/sets bytes
    tombstone_debt = bool(
        row["n_docs"]
        and row["n_tombstones"] > max_tombstone_ratio * row["n_docs"]
    )
    if row["n_batches"] > max_batches or tombstone_debt:
        try:
            report["compacted"] = compact_minhash_index(
                spark, path, folded_retention=folded_retention
            )
        except RuntimeError as exc:
            if "lost the manifest race" not in str(exc):
                raise
            report["compaction_race_lost"] = True
        if vacuum and report["compacted"]:
            report["vacuumed"] = vacuum_minhash_index(spark, path)
    return report


def vacuum_minhash_index(spark, path: str) -> list[str]:
    """Reclaim superseded index versions: every ``versions/`` dir the
    LATEST manifest does not reference (except in-flight rebuilds,
    numbered above the current version — see
    `VersionedManifest.vacuum_versions`), every superseded manifest,
    and any pre-manifest legacy residue (root bands/sets + marker)
    once a manifest exists. Run AFTER probes draining the old version
    finish — the manifest keeps crashes safe, vacuum timing is
    operational. Returns deleted paths."""
    from ..sources.manifest import VersionedManifest

    return VersionedManifest(path).vacuum_versions(
        spark, ("bands", "sets", "tombstones", INDEX_META_FILE)
    )


def append_minhash_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_token: str | None = None,
) -> None:
    """Fold a new (already-accepted) batch into the index under the
    STORED parameter contract — no corpus rewrite.

    Each fold lands in its own ``batch=<token>`` subdirectory with
    OVERWRITE semantics, which makes the fold crash-safe end to end:

    - re-running the same ``batch_token`` (a foreachBatch replay, a
      retry after a crash anywhere inside the fold) overwrites that
      batch's directories instead of appending duplicate rows;
    - a crash BETWEEN the two writes leaves sets without bands —
      write order is deliberate: the batch is merely unindexed until
      the retry (no candidates form). The reverse order would leave
      bands without verify-sets: candidates would FORM and silently
      fail verification — wrong results, not missing ones.

    ``batch_token`` defaults to a fresh UUID (ad-hoc callers get plain
    accumulation); pass a stable token (the streaming batch id) to get
    the idempotent behavior.

    Concurrency: the fold SERIALIZES against compactions and rebuilds
    through the manifest. After its directories are durable, the fold
    publishes a version bump (same payload — the commit point exists
    only to order writers); a compaction that globbed the batch list
    before this fold landed now loses ITS manifest race and fails
    loudly instead of publishing a new version that silently omits the
    batch, and a fold that loses the race (a compaction or rebuild
    committed mid-fold, stranding the fold's directories in a
    superseded version) resolves the new current version and REDOES
    the fold there — an append landing mid-compaction is therefore
    either folded into the new base, visible as a batch dir of the
    live version, or no-oped by the folded-token list: never lost,
    never doubled (tests/test_chaos_fs.py races the interleavings).
    """
    import os as _os
    import uuid as _uuid

    from ..sources.fs import path_exists
    from ..sources.manifest import VersionedManifest

    token = batch_token if batch_token is not None else _uuid.uuid4().hex
    if "/" in token or "=" in token:
        raise ValueError(f"batch_token must be path-safe: {token!r}")
    spark = docs.sparkSession
    vm = VersionedManifest(path)
    for _attempt in range(5):
        # folds land under the CURRENT manifest version's data root
        version, payload = vm.resolve(spark)
        if payload is not None:
            # a token already folded into a batch=base by a compaction
            # is durable in EVERY later version — a replay re-appending
            # it would duplicate its rows (the markers-exist guard
            # below only sees the new version's empty batch dir). See
            # compact_minhash_index's folded-token contract.
            if token in set(payload.get("folded", ())):
                return
            meta, data_root = _minhash_meta_from_payload(
                version, payload, path
            )
        else:
            meta, data_root = _legacy_minhash_meta(spark, path), path
        sets_dir = _os.path.join(data_root, "sets", f"batch={token}")
        bands_dir = _os.path.join(data_root, "bands", f"batch={token}")
        # completion is judged by the writer's _SUCCESS marker, and a
        # COMPLETE sets dir is never rewritten: overwrite is
        # delete-then-write, and deleting complete sets while this
        # batch's bands exist would re-open the
        # candidates-without-verify-sets window the write order exists
        # to close
        sets_done = path_exists(
            spark, _os.path.join(sets_dir, "_SUCCESS")
        )
        bands_done = path_exists(
            spark, _os.path.join(bands_dir, "_SUCCESS")
        )
        if not (sets_done and bands_done):
            # localCheckpoint, NOT persist: callers commonly derive
            # ``docs`` from a probe of THIS index (accept-filter
            # pipelines), so its lineage reads bands/. The first write
            # below invalidates any cache whose lineage touches that
            # path, and a recompute during the second write would probe
            # the HALF-APPENDED index — observed to drop fresh docs
            # from sets/ while their bands landed. An eager checkpoint
            # materializes the rows once, before either write.
            sets = word_shingle_hash_sets(
                docs, text_col, id_col, meta["k"]
            ).localCheckpoint()
            bands = minhash_band_rows_np(
                sets, meta["n_hashes"], meta["n_bands"]
            )
            if not sets_done:
                sets.write.mode("overwrite").parquet(sets_dir)
            bands.write.mode("overwrite").parquet(bands_dir)
            # validate the guard's premise: the skip/never-delete logic
            # above is keyed on _SUCCESS markers, which a cluster tuned
            # with mapreduce.fileoutputcommitter.marksuccessfuljobs=
            # false never writes — the retry guarantee would silently
            # evaporate, so fail loudly at the first fold instead
            if not path_exists(
                spark, _os.path.join(bands_dir, "_SUCCESS")
            ):
                raise RuntimeError(
                    "index fold committed without a _SUCCESS marker — "
                    "the crash-safe retry guard requires "
                    "mapreduce.fileoutputcommitter.marksuccessfuljobs"
                    "=true"
                )
        if payload is None:
            return  # legacy layout: no versions, nothing to race
        # commit point: the version bump orders this fold against
        # compactions/rebuilds (docstring's concurrency contract). A
        # retry whose dirs were already durable still publishes — the
        # original attempt may have crashed before ITS bump, and a
        # compaction mid-glob must still be forced to lose.
        if vm.publish(spark, payload, version):
            vm.vacuum_superseded(spark)
            return
        # lost the race: a compaction/rebuild took the version while
        # this fold was writing — its dirs sit in a superseded (or
        # soon-vacuumed) version root. Redo against the new current.
    raise RuntimeError(
        f"MinHash index fold {token!r} at {path} lost the manifest "
        "race 5 times in a row — writers are churning versions faster "
        "than the fold can land; pause compactions and retry"
    )


def _minhash_tombstone_ids(spark, data_root: str) -> DataFrame | None:
    """Ids deleted from this index version
    (`delete_from_minhash_index`), or None when no complete tombstone
    batch exists — one column ``id``, matching the bands/sets surface;
    the shared `tombstones.read_tombstone_ids` completeness rule."""
    from .tombstones import read_tombstone_ids

    return read_tombstone_ids(spark, data_root, "id")


def delete_from_minhash_index(
    ids: DataFrame,
    path: str,
    delete_token: str | None = None,
) -> None:
    """Delete documents from the persisted MinHash index WITHOUT a
    rebuild — the retraction path (takedowns, right-to-be-forgotten)
    of the dedup family, completing the delete lifecycle across all
    three persisted indexes (`similarity.delete_from_ivf_index`,
    `text.delete_from_bm25_index`).

    Deletes are TOMBSTONES: ids land in an idempotent
    ``tombstones/batch=<token>/`` directory of the current version —
    O(|deleted|), bands/sets untouched — and `dedup_against_index`
    anti-joins them out of the stored bands before the candidate
    join, so a deleted doc stops claiming new batch rows as its
    near-duplicates at the very next probe (the retraction semantics
    that MATTER here: without it, a removed document would keep
    suppressing fresh ingests that resemble it). `compact_minhash_index`
    applies tombstones physically on both sides (bands AND sets) and
    starts the new version with none.

    ``ids`` is a one-column DataFrame (or any DataFrame carrying an
    ``id`` column — the index's internal id surface). Same-token
    retries overwrite their own batch dir; the manifest version bump
    serializes deletes against compactions; compacted-away tokens are
    durable in the ``folded_deletes`` list (disjoint from the append
    tokens' ``folded`` — see `similarity.delete_from_ivf_index`) so
    replays no-op. RE-ADD contract: a tombstone suppresses its id
    wherever it lives, including batches folded after the delete —
    re-adding a deleted id requires compacting first. Requires the
    manifest layout (rebuild a legacy index first).
    """
    from .tombstones import tombstone_delete

    def _resolve(spark, version, payload):
        if payload is None:
            _resolve_minhash_index(spark, path)  # raises if missing
            raise ValueError(
                f"MinHash index at {path} predates the manifest layout "
                "— rebuild with write_minhash_index before deleting"
            )
        _, data_root = _minhash_meta_from_payload(version, payload, path)
        return data_root, "id", "id"

    tombstone_delete(ids, path, delete_token, "MinHash delete", _resolve)


def dedup_against_index(
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs of a NEW batch against the persisted index
    (and within the batch itself): ``(id_a, id_b, jaccard)`` with
    ``id_a`` always a new-batch id.

    Exactly the `minhash_dedup_pairs` plan with the corpus half read
    from the index instead of recomputed: the batch is shingled and
    banded map-side (zero exchange), candidates come from the band-key
    join against stored bands plus the batch's banded self-join, and
    the exact Jaccard verify runs over stored + fresh shingle sets.
    Equivalence contract (pinned in tests): identical pairs to a full
    `minhash_dedup_pairs` over corpus ∪ batch, restricted to pairs
    touching the batch.

    Re-ingested ids (batch id already present in the index) are
    matched against the CORPUS copy of everything else but never
    against themselves; callers rewriting a doc in place should drop
    the old index rows first.
    """
    import os as _os

    spark = new_docs.sparkSession
    meta, data_root = _resolve_minhash_index(spark, path)
    # localCheckpoint, not persist: the probe runs once per batch in
    # streaming ingest, and a persist here would leak one cache entry
    # per trigger (nothing downstream could unpersist it — the
    # returned plan still references it). Checkpoint blocks free with
    # the RDD when the result is garbage collected.
    new_sets = word_shingle_hash_sets(
        new_docs, text_col, id_col, meta["k"]
    ).localCheckpoint()
    new_bands = minhash_band_rows_np(
        new_sets, meta["n_hashes"], meta["n_bands"]
    )
    # project away the batch=<token> partition column the idempotent
    # fold layout adds (see append_minhash_index)
    idx_bands = spark.read.parquet(
        _os.path.join(data_root, "bands")
    ).select("id", "band_id", "band_hash")
    # tombstoned ids (`delete_from_minhash_index`) are pruned from the
    # corpus side BEFORE the candidate join: a deleted doc must stop
    # claiming new rows as its near-duplicates at the next probe. The
    # bands side alone suffices — an id with no band rows can never
    # reach the verify stage. Anti-join side is the tombstone set
    # (deletes since the last compaction), un-hinted so AQE broadcasts
    # it while small.
    tombs = _minhash_tombstone_ids(spark, data_root)
    if tombs is not None:
        idx_bands = idx_bands.join(tombs, "id", "left_anti")
    idx_sets = spark.read.parquet(_os.path.join(data_root, "sets")).select(
        "id", "shset"
    )

    vs_corpus = (
        new_bands.alias("a")
        .join(
            idx_bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") != F.col("b.id")),
            "inner",
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    ba, bb = new_bands.alias("a"), new_bands.alias("b")
    vs_batch = ba.join(
        bb,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id")),
        "inner",
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    cands = vs_corpus.unionAll(vs_batch).distinct()

    # verify surface: fresh sets win for re-ingested ids (same text →
    # same set, so the choice only matters for in-place rewrites)
    all_sets = idx_sets.join(
        new_sets.select("id"), "id", "left_anti"
    ).unionByName(new_sets)
    return verify_pairs_with_sets(all_sets, cands, threshold)


# ---------------------------------------------------------------------------
# Passage-level duplication: winnowing fingerprints (Schleimer et al.,
# "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """Winnowed passage fingerprints: ``(id, fp)`` — the distinct
    window-minimum hashes over word ``k``-gram hashes, one window per
    position, width ``w``.

    The winnowing guarantee: any shared run of ≥ ``k + w - 1`` words
    between two documents shares at least one selected fingerprint —
    so passage-level overlap is detectable from a ~``2/(w+1)`` density
    sample of positions instead of every k-gram. This is the
    PASSAGE-level tier between exact dedup (whole doc) and MinHash
    (whole-doc similarity): it catches a copied paragraph inside two
    otherwise-unrelated documents, which document-level Jaccard
    dilutes below any threshold.

    Docs shorter than ``k`` words emit NOTHING: their only "k-gram"
    would be the truncated whole text, and a fingerprint of that would
    make `duplicate_passages` report tiny/empty near-identical docs as
    sharing a "passage" no k+w−1 run backs — exact dedup is the tier
    for those.

    Pure builtin expressions: k-gram hashing (the shared
    `_kgram_hash_array` chain) and the per-window ``array_min`` run as
    HOFs inside codegen — O(n·w) longs per doc, all map-side. The one
    exchange is the same round-robin repartition every shingle helper
    pays (materializes the words array so HOF lambdas don't
    re-tokenize per reference, and fixes small-file parallelism);
    nothing shuffles BY a key until a consumer joins the output.
    """
    words = tokenize(F.col(text_col))
    src = docs.select(
        F.col(id_col).alias("id"), words.alias("ws")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    src = src.filter(F.size("ws") >= k).select(
        "id", _kgram_hash_array(F.col("ws"), k).alias("hs")
    )
    n_windows = F.greatest(F.size("hs") - w + 1, F.lit(1))
    minima = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda j: F.array_min(F.slice(F.col("hs"), j + 1, w)),
    )
    return src.select(
        "id", F.explode(F.array_distinct(minima)).alias("fp")
    )


def duplicate_passages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    max_docs_per_fp: int = 64,
) -> DataFrame:
    """Document pairs sharing duplicated PASSAGES:
    ``(id_a, id_b, n_shared_fps)`` with ``id_a < id_b`` and at least
    ``min_shared`` winnowed fingerprints in common — the copied-
    paragraph detector document-level similarity misses.

    Plan shape mirrors the MinHash path: fingerprints are computed
    map-side, the only exchanges are the fp self-join and the pair
    count. ``max_docs_per_fp`` drops boilerplate fingerprints shared
    by more than that many docs (license headers, navigation chrome)
    — the stop-shingle guard that bounds every fp bucket, and with it
    the join's worst case, at scale.
    """
    fps = winnow_fingerprints(docs, text_col, id_col, k, w)
    bounded = fps.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("_df") <= max_docs_per_fp).drop("_df")
    a, b = bounded.alias("a"), bounded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def passage_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
    min_shared: int = 1,
) -> DataFrame:
    """PASSAGE-level benchmark decontamination — ``(id,
    n_shared_fps)`` for corpus docs sharing ≥ ``min_shared`` winnowed
    fingerprints with ANY benchmark document. The third granularity
    of the decontamination story, with a guarantee the other two
    cannot give: by the winnowing theorem, every VERBATIM run of
    ≥ ``k + w − 1`` words copied from the benchmark shares ≥ 1
    selected fingerprint — zero false negatives at that run length.
    `benchmark_contamination` (k-gram overlap) scores diffuse
    similarity but a short quoted answer string inside a long doc
    dilutes below any overlap-fraction threshold;
    `semantic_decontaminate` catches paraphrase but not provably;
    this tier is the test-set-quote detector (the GPT-3/Lee-et-al.
    decontamination concern).

    Plan: both sides run the shared winnowing map
    (`winnow_fingerprints` — ~2/(w+1) density, map-side); the
    benchmark's distinct fingerprint set broadcasts (benchmarks are
    MB-scale against a TB corpus) so the corpus side NEVER shuffles
    for the probe — one broadcast-hash semi-probe + the id-keyed
    count, the `benchmark_contamination` shape at passage
    granularity. Sub-``k``-word docs emit no fingerprints (exact
    dedup is their tier, the standing winnowing contract)."""
    corpus_fps = winnow_fingerprints(docs, text_col, id_col, k, w)
    bench_fps = (
        winnow_fingerprints(benchmark, text_col, id_col, k, w)
        .select("fp")
        .distinct()
    )
    return (
        corpus_fps.join(F.broadcast(bench_fps), "fp")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def cluster_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    score_col: str = "score",
    id_col: str = "id",
) -> DataFrame:
    """Pick the doc to KEEP per duplicate cluster: ``(cluster_id,
    keep_id, keep_score)`` — argmax ``score_col``, ties broken toward
    the smaller id.

    `duplicate_clusters` labels components by min id, which is the
    right CLUSTER KEY but an arbitrary KEEP policy; real pipelines keep
    the best copy (longest, highest quality logit, freshest). Cluster
    labels join the scores on id (co-locates shuffle-free if both
    sides are id-bucketed) and a per-cluster window picks the winner —
    rank ordering, not id arithmetic, so string ids (URLs, content
    hashes) tie-break correctly too.

    Every clustered id MUST have a score row: a missing score could
    silently crown the wrong copy (or erase a whole cluster from the
    keep list, deleting every copy downstream), so the join is
    left + assert rather than a quietly-dropping inner join.
    """
    joined = clusters.join(
        scores.select(
            F.col(id_col), F.col(score_col).alias("_score")
        ),
        id_col,
        "left",
    )
    # the assertion rides INSIDE the score expression (a dropped helper
    # column would be pruned by Catalyst, deleting the check): a null
    # score evaluates the raising branch
    joined = joined.withColumn(
        "_score",
        F.when(
            F.col("_score").isNull(),
            F.assert_true(
                F.lit(False),
                F.concat(
                    F.lit("cluster_representatives: no score for id "),
                    F.col(id_col).cast("string"),
                ),
            ).cast(scores.schema[score_col].dataType),
        ).otherwise(F.col("_score")),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("keep_id"),
            F.col("_score").alias("keep_score"),
        )
    )


def duplicated_gram_sites(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run_words: int = 50,
) -> DataFrame:
    """Non-canonical duplicated ``L``-gram start sites — ``(id, pos)``
    for every word position whose ``min_run_words``-word gram appears
    at ≥2 distinct (doc, pos) sites corpus-wide and is NOT the
    corpus-minimal site of that gram (ordered by (id, pos)).

    This is the SEMANTIC DEFINITION of within-corpus exact-substring
    duplication (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better" — the ExactSubstr half; their suffix-array
    formulation re-expressed relationally): a verbatim duplicated run
    of R ≥ L words contains exactly R−L+1 duplicated L-gram starts,
    so gram sites recover duplicated SPANS without materializing runs.
    The first (minimal) occurrence of each gram stays canonical —
    "keep one copy".

    Plan: one map-side gram explosion (×L data — this brute tier is
    the oracle twin and the small-SF path; `exact_substring_dedup`'s
    ``anchors`` tier is the 100 TB path), one groupBy on the gram
    string (partial agg: (min site, count) — 2-value, boilerplate
    skew collapses map-side), one hash join back (one build row per
    gram; probe-side skew is row-lookup, not row-explosion)."""
    L = int(min_run_words)
    if L < 2:
        raise ValueError(f"min_run_words must be ≥ 2, got {L}")
    # r13 opt round, two changes to the gram passes (values unchanged):
    # (a) the parallelism exchange carries RAW (id, text) and tokenize
    #     runs after it behind the explode(array(·)) Generate barrier
    #     (see `word_shingle_hash_sets` — serial-scan fix + fewer
    #     shuffled bytes);
    # (b) grams travel as xxhash64 of the L-gram string (the
    #     `_kgram_hash_array` chain — after the size ≥ L filter its
    #     positions equal the old sequence(0, size−L) exactly), so the
    #     gram groupBy and join-back move 8-byte longs instead of
    #     ~L-word strings (guide §2.3: shuffle fewer/narrower bytes).
    #     Site semantics are identical up to 64-bit collisions — the
    #     standing acceptance of every shingle consumer in this module
    #     (and the string-gram DuckDB oracle twin would surface a real
    #     collision as a parity failure).
    src = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    ).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("id")
    )
    toks = src.select(
        "id", F.explode(F.array(tokenize(F.col("_t")))).alias("ws")
    )
    grams = (
        toks.filter(F.size("ws") >= L)
        .select(
            "id",
            F.posexplode(_kgram_hash_array(F.col("ws"), L)).alias(
                "pos", "gram"
            ),
        )
    )
    stats = (
        grams.groupBy("gram")
        .agg(
            F.min(F.struct("id", "pos")).alias("first"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") >= 2)
        .select("gram", "first")
    )
    return (
        grams.join(stats, "gram")
        .filter(
            ~(
                (F.col("id") == F.col("first.id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .select("id", "pos")
    )


def _winnow_anchor_sites(
    src: DataFrame, k: int, w: int
) -> DataFrame:
    """Positioned winnowing selection over ``src(id, ws)``:
    ``(id, pos, fp)`` — per width-``w`` window of word-``k``-gram
    hashes, the minimal hash and its (leftmost-minimal, deterministic)
    gram position. Identical text selects identical relative
    positions, so two occurrences of a shared ≥ ``k+w−1``-word run
    share an anchor at CORRESPONDING positions — the positional
    strengthening of `winnow_fingerprints`' guarantee that
    verify-extend needs."""
    hs = src.filter(F.size("ws") >= k + w - 1).select(
        "id", _kgram_hash_array(F.col("ws"), k).alias("hs")
    )
    n_windows = F.size("hs") - w + 1
    sites = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda j: F.struct(
            (
                j
                + F.array_position(
                    F.slice(F.col("hs"), j + 1, w),
                    F.array_min(F.slice(F.col("hs"), j + 1, w)),
                )
                - 1
            ).cast("int").alias("pos"),
            F.array_min(F.slice(F.col("hs"), j + 1, w)).alias("fp"),
        ),
    )
    return hs.select(
        "id", F.explode(F.array_distinct(sites)).alias("s")
    ).select("id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))


def exact_substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run_words: int = 50,
    method: str = "grams",
    anchor_k: int = 8,
    max_sites_per_anchor: int | None = None,
) -> DataFrame:
    """Within-corpus EXACT-SUBSTRING dedup (Lee et al. 2021,
    ExactSubstr): remove every verbatim duplicated run of
    ≥ ``min_run_words`` words from all but its first corpus
    occurrence → ``(id, text_dedup, n_words_kept, n_words_removed)``,
    one row per input doc (possibly empty ``text_dedup``). Word
    removal rule: word ``i`` of doc ``d`` is removed iff some
    duplicated NON-canonical L-gram site (d, p) covers it
    (p ≤ i < p+L) — on a clean duplicated span this is exactly the
    span, and the minimal occurrence survives verbatim ("keep one
    copy"). Text is tokenize-normalized (lowercase, single spaces) —
    the standing contract of every operator in this module.

    Two value-identical tiers (pinned in tests):

    - ``grams`` (default; the definition + DuckDB oracle twin): brute
      L-gram explosion — ×L data through one shuffle; exact, and the
      right tier when L is small or the corpus fits the budget.
    - ``anchors`` (the 100 TB path): positioned winnowing anchors at
      density ~2/(w+1), w = L−k+1 — every duplicated run of ≥ L words
      shares an anchor at corresponding positions (winnowing theorem),
      so the banded fp self-join finds every run pair; per candidate
      pair the REAL word arrays verify and maximally extend the match
      (hash collisions die here — they only ever ADD candidates), and
      runs ≥ L emit their non-canonical covered sites. Data through
      the join: ~2·(n/w) anchor rows instead of n·L gram bytes —
      ~L·w/(2·k̄) ≈ 500× lighter at L=50. ``max_sites_per_anchor``
      is the opt-in stop-anchor valve (the `max_docs_per_fp`
      pattern): DEFAULT None keeps every anchor — the family's
      exactness-by-default contract, and what keeps the tiers
      value-identical when one span floods the corpus (an r13 sf0.1
      parity failure caught exactly that: a 1,667-doc planted span's
      fp crossed a 256 valve and the anchors tier silently kept the
      duplicates). Set it at scale when worst-case bucket cost
      matters more than deduping corpus-wide boilerplate.

    The verify-extend stage is an Arrow-batched ``applyInPandas``
    over (id_a, id_b) pair groups — bounded by the two docs' lengths
    plus their anchor list, the MMR-rerank-audited shape."""
    L = int(min_run_words)
    if L < 2:
        raise ValueError(f"min_run_words must be ≥ 2, got {L}")
    if method not in ("grams", "anchors"):
        raise ValueError(f"unknown method: {method}")
    # raw-first repartition + Generate barrier (r13 opt round — see
    # `word_shingle_hash_sets`): tokenize runs post-exchange on every
    # core, and the exchange carries text, not token arrays
    src = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    ).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("id")
    ).select("id", F.explode(F.array(tokenize(F.col("_t")))).alias("ws"))

    if method == "grams":
        dup_sites = duplicated_gram_sites(
            docs, text_col, id_col, min_run_words=L
        )
    else:
        k = min(int(anchor_k), L)
        w = L - k + 1
        anchors = _winnow_anchor_sites(src, k, w)
        # fp-bucket pair emission (r13 opt round, `bucket_pairs`): one
        # exchange on fp instead of the anchor self-join's two-sided
        # subtree; ordered-by-struct(id, pos) pairs are exactly the old
        # (id_a < id_b) | (id_a = id_b & pos_a < pos_b) condition, and
        # the max_sites_per_anchor valve becomes the bucket-size cap
        # (same drop-the-hot-anchor semantics, minus the window sort).
        pairs = (
            bucket_pairs(
                anchors,
                ["fp"],
                ["id", "pos"],
                max_per_bucket=max_sites_per_anchor,
                # exactness-by-default: the registered valve is
                # exact_substring_dedup.max_sites_per_anchor (valves.py)
                allow_unbounded=max_sites_per_anchor is None,
            )
            .groupBy("id_a", "id_b")
            .agg(
                F.collect_list(F.struct("pos_a", "pos_b")).alias("apairs")
            )
        )
        wa = src.select(F.col("id").alias("id_a"), F.col("ws").alias("ws_a"))
        wb = src.select(F.col("id").alias("id_b"), F.col("ws").alias("ws_b"))
        cand = pairs.join(wa, "id_a").join(wb, "id_b")

        from pyspark.sql.types import (
            IntegerType,
            StructField,
            StructType,
        )

        id_type = docs.schema[id_col].dataType
        site_schema = StructType([
            StructField("id", id_type, False),
            StructField("pos", IntegerType(), False),
        ])

        def _extend(pdf_iter):
            for pdf in pdf_iter:
                out_ids, out_pos = [], []
                for row in pdf.itertuples(index=False):
                    wsa, wsb = list(row.ws_a), list(row.ws_b)
                    na, nb = len(wsa), len(wsb)
                    # runs found so far, keyed by alignment diagonal
                    # (pa−pb): anchors inside an already-extended run
                    # on the same diagonal rediscover it — skip them
                    done_runs: dict[int, list[tuple[int, int]]] = {}
                    for ap in sorted(
                        row.apairs, key=lambda p: (p["pos_a"], p["pos_b"])
                    ):
                        pa, pb = ap["pos_a"], ap["pos_b"]
                        diag = pa - pb
                        if any(
                            s <= pa < e for s, e in done_runs.get(diag, ())
                        ):
                            continue
                        # verify the anchor k-gram really matches
                        # (xxhash collisions only ever ADD candidates)
                        if wsa[pa : pa + k] != wsb[pb : pb + k]:
                            continue
                        sa, sb = pa, pb
                        while sa > 0 and sb > 0 and wsa[sa - 1] == wsb[sb - 1]:
                            sa, sb = sa - 1, sb - 1
                        ea, eb = pa + k, pb + k
                        while ea < na and eb < nb and wsa[ea] == wsb[eb]:
                            ea, eb = ea + 1, eb + 1
                        done_runs.setdefault(diag, []).append((sa, ea))
                        run = ea - sa
                        if run < L:
                            continue
                        # non-canonical side = b (pair ordered a<b);
                        # emit its covered L-gram start sites
                        for t in range(run - L + 1):
                            out_ids.append(row.id_b)
                            out_pos.append(sb + t)
                yield pd.DataFrame({"id": out_ids, "pos": out_pos})

        dup_sites = cand.mapInPandas(_extend, schema=site_schema).distinct()

    return _coverage_assemble(src, dup_sites, L)


def _coverage_assemble(
    src: DataFrame, dup_sites: DataFrame, L: int
) -> DataFrame:
    """Shared removal/reassembly tail of the ExactSubstr family:
    ``src(id, ws)`` minus every word covered by a ``dup_sites(id,
    pos)`` L-gram start → ``(id, text_dedup, n_words_kept,
    n_words_removed)``, one row per src doc."""
    sites = dup_sites.groupBy("id").agg(
        F.sort_array(F.collect_set("pos")).alias("sites")
    )
    joined = src.join(sites, "id", "left").select(
        "id",
        "ws",
        F.coalesce(F.col("sites"), F.array().cast("array<int>")).alias(
            "sites"
        ),
    )
    kept = F.filter(
        F.transform(
            F.col("ws"), lambda x, i: F.struct(x.alias("w"), i.alias("i"))
        ),
        lambda s: ~F.exists(
            F.col("sites"),
            lambda p: (p <= s["i"]) & (s["i"] < p + L),
        ),
    )
    return joined.select(
        F.col("id"),
        F.array_join(
            F.transform(kept, lambda s: s["w"]), " "
        ).alias("text_dedup"),
        F.size(kept).alias("n_words_kept"),
        (F.size("ws") - F.size(kept)).alias("n_words_removed"),
    )


def exact_substr_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run_words: int = 50,
    method: str = "grams",
    anchor_k: int = 8,
    max_sites_per_anchor: int | None = None,
) -> DataFrame:
    """INCREMENTAL ExactSubstr: remove from every BATCH doc each
    verbatim run of ≥ ``min_run_words`` words that appears anywhere
    in the CORPUS → ``(id, text_dedup, n_words_kept,
    n_words_removed)``, one row per batch doc. The
    `dedup_against_index` orientation for the exact-substring tier:
    the corpus is settled (its copies are the canonical ones, so
    EVERY matching batch site is removed — no (id, pos) ordering),
    only the new batch is rewritten. Batch-internal duplication is
    deliberately out of scope — run `exact_substring_dedup` on the
    batch for that.

    Tiers mirror `exact_substring_dedup` and are pinned identical:
    ``grams`` — batch L-gram sites semi-joined against the corpus's
    distinct L-grams (the oracle twin; the corpus side is a build
    side, the batch side streams); ``anchors`` — positioned winnowing
    on BOTH sides (every shared run ≥ L puts an anchor pair at
    corresponding positions), banded fp join, Arrow verify-extend
    emitting batch-side covered sites. At 100 TB the corpus-side
    anchor table is the thing a real deployment would persist and
    append to (the minhash-index pattern); this operator takes it as
    a DataFrame so that storage choice stays with the caller."""
    L = int(min_run_words)
    if L < 2:
        raise ValueError(f"min_run_words must be ≥ 2, got {L}")
    if method not in ("grams", "anchors"):
        raise ValueError(f"unknown method: {method}")
    par = batch.sparkSession.sparkContext.defaultParallelism
    b_src = batch.select(
        F.col(id_col).alias("id"),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).repartition(par)
    c_src = corpus.select(
        F.col(id_col).alias("id"),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).repartition(par)

    def _grams_of(src: DataFrame) -> DataFrame:
        return src.filter(F.size("ws") >= L).select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - L),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("ws"), i + 1, L)
                    ),
                )
            ).alias("pos", "gram"),
        )

    if method == "grams":
        dup_sites = (
            _grams_of(b_src)
            .join(
                _grams_of(c_src).select("gram").distinct(),
                "gram",
                "left_semi",
            )
            .select("id", "pos")
        )
        return _coverage_assemble(b_src, dup_sites, L)

    k = min(int(anchor_k), L)
    w = L - k + 1
    ba = _winnow_anchor_sites(b_src, k, w)
    ca = _winnow_anchor_sites(c_src, k, w)
    dup_sites = _anchor_verify_extend(
        ba,
        ca,
        b_src,
        c_src,
        L,
        k,
        max_sites_per_anchor,
        batch.schema[id_col].dataType,
    )
    return _coverage_assemble(b_src, dup_sites, L)


def _anchor_verify_extend(
    ba: DataFrame,
    ca: DataFrame,
    b_src: DataFrame,
    c_src: DataFrame,
    L: int,
    k: int,
    max_sites_per_anchor: int | None,
    id_type,
) -> DataFrame:
    """Shared anchors-tier probe: batch anchors × corpus anchors on
    fp (stop-anchor valve on the CORPUS side — the side whose bucket
    size the batch cannot control), per-pair Arrow verify-extend over
    the real word arrays, emitting the batch-side covered L-gram
    start sites ``(id, pos)``. Used by both the in-session
    (`exact_substr_against_corpus`) and persisted
    (`exact_substr_against_index`) forms."""
    if max_sites_per_anchor is not None:
        ca = ca.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        ).filter(F.col("_df") <= max_sites_per_anchor).drop("_df")
    pairs = (
        ba.alias("b")
        .join(ca.alias("c"), F.col("b.fp") == F.col("c.fp"))
        .select(
            F.col("b.id").alias("id_b"),
            F.col("b.pos").alias("pos_b"),
            F.col("c.id").alias("id_c"),
            F.col("c.pos").alias("pos_c"),
        )
        .groupBy("id_b", "id_c")
        .agg(F.collect_list(F.struct("pos_b", "pos_c")).alias("apairs"))
    )
    cand = pairs.join(
        b_src.select(F.col("id").alias("id_b"), F.col("ws").alias("ws_b")),
        "id_b",
    ).join(
        c_src.select(F.col("id").alias("id_c"), F.col("ws").alias("ws_c")),
        "id_c",
    )

    from pyspark.sql.types import IntegerType, StructField, StructType

    site_schema = StructType([
        StructField("id", id_type, False),
        StructField("pos", IntegerType(), False),
    ])

    def _extend(pdf_iter):
        for pdf in pdf_iter:
            out_ids, out_pos = [], []
            for row in pdf.itertuples(index=False):
                wsb, wsc = list(row.ws_b), list(row.ws_c)
                nb, nc = len(wsb), len(wsc)
                done_runs: dict[int, list[tuple[int, int]]] = {}
                for ap in sorted(
                    row.apairs, key=lambda p: (p["pos_b"], p["pos_c"])
                ):
                    pb, pc = ap["pos_b"], ap["pos_c"]
                    diag = pb - pc
                    if any(
                        s <= pb < e for s, e in done_runs.get(diag, ())
                    ):
                        continue
                    if wsb[pb : pb + k] != wsc[pc : pc + k]:
                        continue
                    sb, sc = pb, pc
                    while sb > 0 and sc > 0 and wsb[sb - 1] == wsc[sc - 1]:
                        sb, sc = sb - 1, sc - 1
                    eb, ec = pb + k, pc + k
                    while eb < nb and ec < nc and wsb[eb] == wsc[ec]:
                        eb, ec = eb + 1, ec + 1
                    done_runs.setdefault(diag, []).append((sb, eb))
                    run = eb - sb
                    if run < L:
                        continue
                    for t in range(run - L + 1):
                        out_ids.append(row.id_b)
                        out_pos.append(sb + t)
            yield pd.DataFrame({"id": out_ids, "pos": out_pos})

    return cand.mapInPandas(_extend, schema=site_schema).distinct()


def write_substr_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run_words: int = 50,
    anchor_k: int = 8,
) -> None:
    """Persist the ExactSubstr probe surface — the fourth member of
    the index estate (MinHash / IVF / BM25 / substr): ``anchors/``
    (id, pos, fp — the positioned winnowing selection at
    k = ``anchor_k``, w = L−k+1) and ``docs/`` (id, ws — the
    tokenized word arrays verify-extend reads; ExactSubstr is a
    VERBATIM technique, so the index necessarily carries the corpus
    words, exactly as a suffix array would), under the
    manifest-committed ``versions/`` layout (pointer-flip rebuild,
    the `write_minhash_index` commit protocol: a crash mid-rebuild
    leaves the old index live). Daily dedup then probes at
    O(|batch| anchors + matched pairs): the corpus is winnowed ONCE,
    and only MATCHED corpus docs' word arrays are read at
    verify-extend time (column-pruned, id-keyed join)."""
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.fs import require_success_marker
    from ..sources.manifest import VersionedManifest

    L = int(min_run_words)
    if L < 2:
        raise ValueError(f"min_run_words must be ≥ 2, got {L}")
    k = min(int(anchor_k), L)
    w = L - k + 1
    spark = corpus.sparkSession
    vm = VersionedManifest(path)
    version = vm.latest_version(spark)
    rel = _pp.join("versions", f"v{version + 1}-{_uuid.uuid4().hex[:8]}")
    vroot = _pp.join(path, rel)
    src = corpus.select(
        F.col(id_col).alias("id"),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).repartition(spark.sparkContext.defaultParallelism)
    src.write.mode("errorifexists").parquet(
        _pp.join(vroot, "docs", "batch=base")
    )
    _winnow_anchor_sites(src, k, w).write.mode("errorifexists").parquet(
        _pp.join(vroot, "anchors", "batch=base")
    )
    require_success_marker(
        spark, _pp.join(vroot, "docs", "batch=base"), "substr index build"
    )
    require_success_marker(
        spark,
        _pp.join(vroot, "anchors", "batch=base"),
        "substr index build",
    )
    vm.publish_or_raise(
        spark,
        {
            "current": rel,
            "min_run_words": L,
            "anchor_k": k,
            "layout": "batch-v1",
        },
        version,
        "substr index rebuild",
    )


def _resolve_substr_index(spark, path: str) -> tuple[dict, str]:
    """(parameter contract, data root) for a `write_substr_index`
    layout; raises on anything else — probing with guessed (k, w)
    silently matches nothing, which at dedup time means duplicates
    sail through."""
    import posixpath as _pp

    from ..sources.manifest import VersionedManifest

    _version, payload = VersionedManifest(path).resolve(spark)
    if payload is None:
        raise ValueError(
            f"no substr index manifest under {path} — not an index "
            "directory, or written by another tool"
        )
    for key in ("current", "min_run_words", "anchor_k"):
        if key not in payload:
            raise ValueError(
                f"substr index manifest at {path} lacks {key!r}"
            )
    return payload, _pp.join(path, payload["current"])


def read_substr_index_meta(spark, path: str) -> dict:
    """The parameter contract the probe will use (manifest payload)."""
    meta, _root = _resolve_substr_index(spark, path)
    return dict(meta)


def append_substr_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_token: str | None = None,
) -> None:
    """Fold a new day's docs into the CURRENT index version: anchors
    and word arrays land as ``batch=<token>`` subdirectories beside
    ``batch=base`` (per-batch overwrite = replay idempotency, the
    minhash-append layout; winnowing parameters come from the
    manifest so appended anchors are join-compatible by
    construction)."""
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.fs import require_success_marker

    token = batch_token if batch_token is not None else _uuid.uuid4().hex
    if "/" in token or "=" in token:
        raise ValueError(f"batch_token must be path-safe: {token!r}")
    spark = docs.sparkSession
    meta, vroot = _resolve_substr_index(spark, path)
    k = int(meta["anchor_k"])
    w = int(meta["min_run_words"]) - k + 1
    src = docs.select(
        F.col(id_col).alias("id"),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).repartition(spark.sparkContext.defaultParallelism)
    src.write.mode("overwrite").parquet(
        _pp.join(vroot, "docs", f"batch={token}")
    )
    _winnow_anchor_sites(src, k, w).write.mode("overwrite").parquet(
        _pp.join(vroot, "anchors", f"batch={token}")
    )
    require_success_marker(
        spark, _pp.join(vroot, "docs", f"batch={token}"), "substr append"
    )
    require_success_marker(
        spark,
        _pp.join(vroot, "anchors", f"batch={token}"),
        "substr append",
    )


def exact_substr_against_index(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run_words: int | None = None,
    max_sites_per_anchor: int | None = None,
) -> DataFrame:
    """`exact_substr_against_corpus`, persisted form: the corpus side
    comes from a `write_substr_index` layout (pre-winnowed anchors +
    stored word arrays) instead of being recomputed per batch —
    pinned ≡ the in-session form in tests. ``min_run_words`` may be
    RAISED above the index's L (longer runs still share the stored
    anchors — the winnowing guarantee only strengthens; verify-extend
    filters at the requested length) but never lowered: anchors at
    (k, w = L_idx−k+1) certify nothing below L_idx, and a silent
    under-L probe would return silently-partial dedup."""
    spark = batch.sparkSession
    meta, vroot = _resolve_substr_index(spark, path)
    L_idx = int(meta["min_run_words"])
    k = int(meta["anchor_k"])
    w = L_idx - k + 1
    L = L_idx if min_run_words is None else int(min_run_words)
    if L < L_idx:
        raise ValueError(
            f"probe min_run_words={L} below the index's {L_idx}: the "
            f"stored anchors only certify runs ≥ {L_idx} — rebuild "
            "the index at the smaller L"
        )
    import posixpath as _pp

    b_src = batch.select(
        F.col(id_col).alias("id"),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).repartition(spark.sparkContext.defaultParallelism)
    ba = _winnow_anchor_sites(b_src, k, w)
    ca = spark.read.parquet(_pp.join(vroot, "anchors")).select(
        "id", "pos", "fp"
    )
    c_words = spark.read.parquet(_pp.join(vroot, "docs")).select(
        "id", "ws"
    )
    dup_sites = _anchor_verify_extend(
        ba,
        ca,
        b_src,
        c_words,
        L,
        k,
        max_sites_per_anchor,
        batch.schema[id_col].dataType,
    )
    return _coverage_assemble(b_src, dup_sites, L)
