"""Text-analysis operators for training-data pipelines: quality stats,
language identification, token counting, document fingerprinting.

All builtin JVM expressions — these run over every document of a
100 TB corpus, so nothing here may leave whole-stage codegen. The
regex/char-class choices are deliberately simple enough to behave
identically in Spark (Java regex) and DuckDB (RE2), which is what the
oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text, tokenize

#: Small distinctive stopword sets (public linguistics commonplace) for
#: the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "y", "que", "es"],
}

#: Tokenizer: alphanumeric runs OR single non-space symbols (a BPE-ish
#: pre-tokenization split).
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

PUNCT_CLASS = r"[.,!?;:]"


def words(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def _stopword_hits(tokens: Column, stopwords: list[str]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def text_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Quality-scoring features: length, word count, mean word length,
    punctuation count/ratio, stopword ratio, uppercase ratio.

    ``keep_cols`` rides extra input columns through the projection
    (r14 opt round, guide §2.4): the stats are a pure map-side
    projection, so a caller that needs stats NEXT TO other columns
    (a label, the text itself) passes them here instead of joining
    the stats back to the source on ``id_col`` — that join is a
    whole extra exchange+sort of two projections of the same scan.
    Default ``()`` leaves every existing caller's plan byte-identical.
    """
    t = F.col(text_col)
    w = words(t)
    n_words = F.size(w)
    punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    upper = F.length(t) - F.length(F.regexp_replace(t, "[A-Z]", ""))
    sw_hits = _stopword_hits(w, LANG_STOPWORDS["en"])
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_words.alias("n_words"),
        (
            F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
            / n_words
        ).alias("mean_word_len"),
        punct.alias("n_punct"),
        (punct / F.length(t)).alias("punct_ratio"),
        (sw_hits / n_words).alias("stopword_ratio"),
        (upper / F.length(t)).alias("upper_ratio"),
        *[F.col(c) for c in keep_cols],
    )


#: linear quality-classifier head: weights are binary fractions so
#: every product is an exact IEEE double — Spark and any SQL oracle
#: computing the same expression tree get bit-identical logits.
QUALITY_WEIGHTS = {
    "bias": -2.0,
    "n_words": 0.015625,  # 1/64 per word: reward substance
    "mean_word_len": 0.25,
    "punct_ratio": -8.0,
    "stopword_ratio": 4.0,  # English prose has stopwords; listings don't
    "upper_ratio": -4.0,
}


#: the feature order train_quality_classifier optimizes and
#: quality_logit consumes — one place so the two cannot drift
QUALITY_FEATURE_COLS = (
    "n_words",
    "mean_word_len",
    "punct_ratio",
    "stopword_ratio",
    "upper_ratio",
)


def train_quality_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_epochs: int = 10,
    lr: float = 0.5,
    l2: float = 0.0,
) -> dict[str, float]:
    """Train the linear quality head `quality_logit` consumes — the
    classifier stage of the DCLM/FineWeb-Edu recipe (a fastText-style
    model on labeled seed data) distilled to the `text_stats` feature
    head: full-batch logistic-regression gradient descent over the
    five features, z-standardized for conditioning (raw scales span
    ~[0,1] ratios to hundreds of words), with the learned weights
    mapped BACK to raw feature space so the returned dict drops into
    ``quality_logit(docs, weights=...)`` verbatim. Labels are 0/1 in
    ``label_col``.

    Distribution shape: training state is SIX floats. Each epoch is
    ONE aggregate over the corpus (Σ (σ(w·z)−y)·z_j — partial
    aggregation map-side, a 1-row collect per epoch: the bounded-
    collect pattern of `train_bpe_merges`); the standardized feature
    projection is cached across epochs. No MLlib, no UDF, no
    sampling — deterministic given the corpus up to float-sum
    association, which is why the oracle compares ROUNDED scores
    (queries.llm._train_quality_oracle replays every epoch unrolled).
    For the hashed-n-gram sibling (weights per feature bucket instead
    of per stat) see `train_hashed_ngram_classifier`."""
    import math

    n_feat = len(QUALITY_FEATURE_COLS)
    # stats + label in ONE projection (r14 opt round, guide §2.4):
    # text_stats is map-side, so riding the label through keep_cols
    # replaces the old st ⋈ docs join-back on id_col — one exchange +
    # two sorts of two projections of the same scan, gone. Identical
    # rows for unique ids (the operator's contract; the old inner
    # join additionally multiplied duplicate-id rows, which was a
    # latent row-explosion hazard, not a feature).
    feats = text_stats(docs, text_col, id_col, keep_cols=(label_col,)).select(
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c) for c in QUALITY_FEATURE_COLS],
        "n_chars",
    ).filter((F.col("n_words") > 0) & (F.col("n_chars") > 0))
    xs = [F.col(c).cast("double") for c in QUALITY_FEATURE_COLS]
    stats = feats.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(x).alias(f"m{j}") for j, x in enumerate(xs)],
        *[F.avg(x * x).alias(f"s{j}") for j, x in enumerate(xs)],
    ).first()
    n = stats["n"]
    if n == 0:
        raise ValueError("train_quality_classifier: no scoreable docs")
    means = [stats[f"m{j}"] for j in range(n_feat)]
    stds = [
        max(math.sqrt(stats[f"s{j}"] - means[j] * means[j]), 1e-12)
        for j in range(n_feat)
    ]
    # the epoch loop scans this 6-double projection 1×/epoch; size its
    # partitioning to the ROW COUNT just measured (guide §2: scale-
    # adaptive, not a local-core constant) — at bench scale that is 1
    # partition (5k rows), so each of the n_epochs jobs is one task
    # instead of a 32-task scan of a near-empty cache; at corpus scale
    # it grows linearly (~2M rows ≈ 100 MB deserialized per task).
    n_parts = max(1, int(n // 2_000_000) + (1 if n % 2_000_000 else 0))
    z = feats.select(
        "_y",
        *[
            ((x - F.lit(means[j])) / F.lit(stds[j])).alias(f"z{j}")
            for j, x in enumerate(xs)
        ],
    ).repartition(n_parts).persist()
    try:
        w = [0.0] * n_feat
        b = 0.0
        for _ in range(int(n_epochs)):
            logit = F.lit(b)
            for j in range(n_feat):
                logit = logit + F.lit(w[j]) * F.col(f"z{j}")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
            g = z.agg(
                F.sum(p - F.col("_y")).alias("gb"),
                *[
                    F.sum((p - F.col("_y")) * F.col(f"z{j}")).alias(
                        f"g{j}"
                    )
                    for j in range(n_feat)
                ],
            ).first()
            b = b - lr * (g["gb"] / n)
            w = [
                w[j] - lr * (g[f"g{j}"] / n + l2 * w[j])
                for j in range(n_feat)
            ]
    finally:
        z.unpersist()
    out = {
        c: w[j] / stds[j] for j, c in enumerate(QUALITY_FEATURE_COLS)
    }
    out["bias"] = b - sum(
        w[j] * means[j] / stds[j] for j in range(n_feat)
    )
    return out


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compressibility as a quality/repetition signal —
    ``(id, n_bytes, n_compressed, ratio)`` with ratio =
    compressed/raw UTF-8 bytes (6 dp): the RefinedWeb/MassiveText
    family's cheap content filter — machine-generated boilerplate and
    looped spam compress far below natural prose (~0.3–0.45 for
    English text; << 0.3 flags repetition `ngram_repetition` then
    localizes, >> 0.9 flags already-compressed/binary junk that
    leaked through the text column).

    This is a sanctioned Arrow-batched Python surface (one scalar
    pandas UDF over the text column — zlib is stdlib C, ~100 MB/s per
    core, and no JVM expression computes DEFLATE): the UDF returns
    only the compressed LENGTH; byte length, the division and the
    rounding stay JVM-side. NULL text → NULL metrics (no fake zeros);
    empty text → ratio NULL (0/0 has no honest value). Deterministic
    for a fixed zlib version+level — pin thresholds per deployment,
    not across zlib upgrades (the compressed SIZE may drift a few
    bytes between zlib builds; the signal, not the exact integer, is
    the contract — hence no DuckDB oracle, pytest pins against the
    same interpreter's zlib)."""
    import pandas as pd  # noqa: F401 (documents the Arrow path)
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("long")
    def _zlen(s):
        import zlib

        return s.map(
            lambda t: None
            if t is None
            else len(zlib.compress(t.encode("utf-8"), lvl))
        )

    t = F.col(text_col)
    n_bytes = F.octet_length(t)
    return docs.select(
        F.col(id_col).alias("id"),
        n_bytes.alias("n_bytes"),
        _zlen(t).alias("n_compressed"),
    ).withColumn(
        "ratio",
        F.when(
            F.col("n_bytes") > 0,
            F.round(F.col("n_compressed") / F.col("n_bytes"), 6),
        ),
    )


def quality_logit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    keep_cols: tuple = (),
) -> DataFrame:
    """Model-based quality scoring: a linear classifier logit over the
    `text_stats` feature vector — the classifier-scoring stage of a
    fastText/DCLM-style filtering pipeline with the model distilled to
    a linear head (swap `QUALITY_WEIGHTS` for trained coefficients).

    Pure column math inside whole-stage codegen: no UDF, no shuffle,
    linear scan — the shape that survives 100 TB. The logit is summed
    left-to-right in a fixed order so an oracle replicating the tree
    matches bit-for-bit; the emitted score is rounded to 6 places and
    the keep flag derives from the rounded score.
    """
    w = dict(QUALITY_WEIGHTS if weights is None else weights)
    # keep_cols (r14 opt round): same map-side passthrough contract as
    # text_stats — callers that need the score NEXT TO other columns
    # (a label for an eval join) ride them through instead of joining
    # the scores back on id_col. Default () is plan-identical.
    st = text_stats(docs, text_col, id_col, keep_cols=keep_cols)
    logit = (
        F.lit(w["bias"])
        + F.lit(w["n_words"]) * F.col("n_words")
        + F.lit(w["mean_word_len"]) * F.col("mean_word_len")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["upper_ratio"]) * F.col("upper_ratio")
    )
    score = F.round(logit, 6)
    return st.select(
        F.col(id_col),
        score.alias("quality_logit"),
        (score > 0).cast("int").alias("keep"),
        *[F.col(c) for c in keep_cols],
    )


#: the eight "required" English words of Gopher rule A1.7 (Rae et al.
#: 2021, "Scaling Language Models: ... Gopher", appendix A1.1)
GOPHER_REQUIRED_WORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """The Gopher document-level quality rules (Rae et al. 2021,
    appendix A1.1 — the rule set RefinedWeb/Dolma/FineWeb reuse) as
    ONE zero-shuffle projection: per doc, the seven doc-level signals
    with their per-rule booleans and the conjunction ``pass_gopher``.
    (The repetition sub-family — duplicate-line/top-n-gram fractions
    — needs per-doc aggregations and lives in `ngram_repetition`;
    compose with a join when running the full filter.)

    Rules, at the paper's default thresholds: word count in
    [50, 100k]; mean word length in [3, 10]; symbol-to-word ratio
    (``#`` chars + ``...`` runs) ≤ 0.1; ≤ 90% of lines starting with
    a bullet; ≤ 30% of lines ending with an ellipsis; ≥ 80% of words
    containing an alphabetic character; ≥ 2 of the eight required
    English words present. All signals are integer-count divisions,
    so both engines compute bit-identical doubles and the flags can
    never flip cross-engine; emitted ratios are ROUND(…, 6) for the
    oracle, flags derive from the exact values. Pure column math in
    whole-stage codegen — the shape that survives 100 TB."""
    text_c = F.coalesce(F.col(text_col), F.lit(""))
    # tokenize, not words(): the empty doc must count 0 words (the
    # ['']-for-empty split artifact would read as one empty word and
    # desync every ratio from the oracle's list_filter'd tokens)
    ws = tokenize(F.col(text_col))
    n_words = F.size(ws)
    nw = F.greatest(n_words, F.lit(1))  # guard: empty doc divides by 1
    mean_wl = F.aggregate(
        ws, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / nw
    n_hash = F.length(text_c) - F.length(F.replace(text_c, F.lit("#")))
    n_ellipsis = (
        F.length(text_c) - F.length(F.replace(text_c, F.lit("...")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis) / nw
    lines = F.split(text_c, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("•")
            | F.ltrim(l).startswith("- "),
        )
    )
    ellipsis_end = F.size(
        F.filter(lines, lambda l: F.rtrim(l).endswith("..."))
    )
    bullet_ratio = bullet / n_lines.cast("double")
    ellipsis_ratio = ellipsis_end / n_lines.cast("double")
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    alpha_ratio = alpha_words / nw.cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
        )
    )
    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (mean_wl >= min_mean_word_len) & (
        mean_wl <= max_mean_word_len
    )
    ok_sym = symbol_ratio <= max_symbol_ratio
    ok_bul = bullet_ratio <= max_bullet_line_ratio
    ok_ell = ellipsis_ratio <= max_ellipsis_line_ratio
    ok_alpha = alpha_ratio >= min_alpha_word_ratio
    ok_stop = stop_hits >= min_required_stopwords
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("n_required_stopwords"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_bul.alias("ok_bullet_lines"),
        ok_ell.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (
            ok_wc & ok_mwl & ok_sym & ok_bul & ok_ell & ok_alpha
            & ok_stop
        ).alias("pass_gopher"),
    )


#: C4's LINE blocklist (Raffel et al. 2020 §2.2): the paper's one
#: line-granularity blocklist rule — a line with the word Javascript
#: is dropped (the page survives)
C4_LINE_BLOCKLIST = ("javascript",)

#: C4's PAGE blocklist (same §2.2, page granularity): "lorem ipsum"
#: or a curly bracket ANYWHERE discards the whole page — r12 ADVICE
#: fidelity fix; these were previously (incorrectly) applied per line
C4_PAGE_BLOCKLIST = ("lorem ipsum", "{", "}")


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    blocklist: tuple = C4_LINE_BLOCKLIST,
    page_blocklist: tuple = C4_PAGE_BLOCKLIST,
    dedup_lines: bool = True,
    min_lines: int = 1,
) -> DataFrame:
    """C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2 —
    the T5 pipeline's cleaning pass, reused by every C4 reproduction):
    first drop every PAGE containing a ``page_blocklist`` phrase
    (lowercased substring over the whole text — the paper's
    page-granularity rules: "lorem ipsum" and curly brackets discard
    the document, not just the line); then per surviving doc, split
    into lines and keep only lines that (a) end in a terminal
    punctuation mark (``.!?"``), (b) carry at least
    ``min_words_per_line`` words, (c) contain no line-``blocklist``
    phrase (the paper's Javascript rule is line-level); then remove
    every GLOBAL duplicate
    line except its first occurrence (ordered by ``(doc_id, line
    position)`` — deterministic; the paper's three-sentence-span rule
    approximated at line granularity, which is what public C4
    reimplementations ship); reassemble surviving lines in document
    order and drop docs left with fewer than ``min_lines``.

    Returns ``(id, text_clean, n_lines_kept)``.

    100 TB shape: the per-line filters are map-side; the global dedup
    is ONE shuffle keyed on the line content (the same key layout as
    exact_dedup_groups — skew on a mega-duplicated boilerplate line
    means that line's group lands on one reducer, but the group
    collapses to min(doc,pos), a 2-value aggregate, so it's an
    aggregate-skew not a row-skew problem: partial aggregation
    absorbs it map-side); the reassembly groups by doc id. Kept
    deliberately window-free on the dedup side — ``min_by`` partial-
    aggregates where a row_number window would sort whole
    partitions."""
    src = docs
    for phrase in page_blocklist:
        # page-granularity discard: map-side filter before the explode
        src = src.filter(
            ~F.contains(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(phrase),
            )
        )
    lines_arr = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    exploded = src.select(
        F.col(id_col).alias("id"), F.posexplode(lines_arr)
    ).select("id", F.col("pos"), F.trim(F.col("col")).alias("line"))
    kept = exploded.filter(F.length("line") > 0)
    if require_terminal_punct:
        kept = kept.filter(
            F.substring(F.col("line"), -1, 1).isin(".", "!", "?", '"')
        )
    if min_words_per_line > 0:
        kept = kept.filter(
            F.size(tokenize(F.col("line"))) >= min_words_per_line
        )
    for phrase in blocklist:
        kept = kept.filter(
            ~F.contains(F.lower(F.col("line")), F.lit(phrase))
        )
    if dedup_lines:
        # first global occurrence per line content, ordered (id, pos):
        # an aggregate (min over a composite orderable struct), not a
        # window — partial aggregation absorbs boilerplate skew
        # map-side. Renamed projection breaks the self-join lineage.
        first = (
            kept.groupBy("line")
            .agg(F.min(F.struct("id", "pos")).alias("_first"))
            .select(
                F.col("line").alias("_dline"),
                F.col("_first.id").alias("_fid"),
                F.col("_first.pos").alias("_fpos"),
            )
        )
        kept = kept.join(
            first,
            (F.col("line") == F.col("_dline"))
            & (F.col("id") == F.col("_fid"))
            & (F.col("pos") == F.col("_fpos")),
        ).select("id", "pos", "line")
    out = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return out.filter(F.col("n_lines_kept") >= min_lines)


#: Gopher A1.2 default thresholds (Rae et al. 2021, table A1) —
#: max allowed fraction per signal
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_fraction": 0.30,
    "dup_line_char_fraction": 0.20,
    "top_2gram_char_fraction": 0.20,
    "top_3gram_char_fraction": 0.18,
    "top_4gram_char_fraction": 0.16,
    "dup_5gram_char_fraction": 0.15,
    "dup_6gram_char_fraction": 0.14,
    "dup_7gram_char_fraction": 0.13,
    "dup_8gram_char_fraction": 0.12,
    "dup_9gram_char_fraction": 0.11,
    "dup_10gram_char_fraction": 0.10,
}


def gopher_repetition_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
) -> DataFrame:
    """The Gopher REPETITION rule set (Rae et al. 2021 appendix A1.2
    — the sibling of `gopher_quality_flags`' doc-level rules, together
    the full Gopher filter): per doc, (a) duplicate-LINE fraction and
    duplicate-line CHARACTER fraction (beyond-first occurrences of an
    exact repeated line), (b) top-n-gram character fraction for
    n=2,3,4 (characters claimed by the single most frequent word
    n-gram), (c) duplicate-n-gram character fraction for n=5..10
    (characters in beyond-first occurrences of any repeated n-gram —
    the standard non-overlap-adjusted accounting public
    reimplementations ship; Gopher's own masking is overlap-aware,
    which only lowers the fraction, so this form is conservative).
    One boolean per signal at the paper's thresholds + the
    ``pass_repetition`` conjunction.

    Counting contract (identical in the DuckDB oracle): words =
    whitespace-lowered tokens; an n-gram's characters = its word
    characters (no join spaces: ``len(gram) − (n−1)``); denominators
    = total word characters (for gram signals) and total line
    characters / line count (for line signals); top-gram ties break
    by (count, chars, gram) descending. Fractions are exact
    integer-over-integer divisions — bit-identical cross-engine.

    Shape at 100 TB: nine gram passes explode to (id, n, gram) and
    hash-aggregate — all shuffles are id- or (id,gram)-keyed partial
    aggregates; no windows, no corpus-wide keys (unlike c4_clean's
    global dedup, repetition is per-document by definition)."""
    th = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        th.update(thresholds)
    ws = tokenize(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
        ws.alias("w"),
    )
    total = base.select(
        "id",
        F.aggregate(
            F.col("w"), F.lit(0), lambda a, x: a + F.length(x)
        ).alias("total_chars"),
    )

    # --- line signals -------------------------------------------------
    lines = base.select(
        "id", F.explode(F.split(F.col("t"), "\n")).alias("raw")
    ).select("id", F.trim(F.col("raw")).alias("line")).filter(
        F.length("line") > 0
    )
    lc = lines.groupBy("id", "line").agg(F.count(F.lit(1)).alias("c"))
    line_stats = lc.groupBy("id").agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.col("c") - 1).alias("dup_lines"),
        F.sum(F.col("c") * F.length("line")).alias("line_chars"),
        F.sum((F.col("c") - 1) * F.length("line")).alias(
            "dup_line_chars"
        ),
    )

    # --- gram signals: one unioned (id, n, gram) pass -------------------
    # Measured note (r12): a single-generator alternative (flatten one
    # 9-n struct array per doc, one tokenize) was tried and is 3.5×
    # SLOWER at 1× and par at 10× — the per-row mega-array allocation
    # costs more than the nine tokenizes it saves. Nine pipelined
    # generates win; keep them.
    def _grams(n: int):
        idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
        arr = F.when(
            F.size("w") >= n,
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, n))
            ),
        ).otherwise(F.slice(F.col("w"), 1, 0))  # empty array<string>
        return base.select(
            "id", F.lit(n).alias("n"), F.explode(arr).alias("gram")
        )

    grams = _grams(2)
    for n in (3, 4, 5, 6, 7, 8, 9, 10):
        grams = grams.unionByName(_grams(n))
    # Count on (xxhash64(gram), chars), not the gram string (r13,
    # measured −27% on the full op at 10×: the hash-agg keys and the
    # shuffle carry 12 bytes instead of up-to-10-word strings).
    # Output-identical by construction: every emitted signal is
    # c·chars or Σ(c−1)·chars — the gram's identity is never emitted,
    # and a (c, chars) tie across distinct grams yields the same
    # product either way. A 64-bit collision WITHIN one (id, n,
    # chars) group (same doc, same n, same char length) could merge
    # two counts; groups are doc-local (≤ doc words), so the exposure
    # is ~|doc|²·2⁻⁶⁴ per doc — accepted, and the DuckDB oracle still
    # counts exact strings, so any collision would surface as a
    # parity failure rather than hide.
    gc = grams.groupBy(
        "id",
        "n",
        F.xxhash64("gram").alias("gh"),
        (F.length("gram") - (F.col("n") - 1)).alias("chars"),
    ).agg(F.count(F.lit(1)).alias("c"))
    per_n = gc.groupBy("id", "n").agg(
        F.max(
            F.struct(
                F.col("c").alias("c"),
                F.col("chars").alias("chars"),
            )
        ).alias("top"),
        F.sum(
            F.when(
                F.col("c") >= 2, (F.col("c") - 1) * F.col("chars")
            ).otherwise(F.lit(0))
        ).alias("dup_chars"),
    )
    top_chars = F.col("top.c") * F.col("top.chars")
    agg_exprs = []
    for n in (2, 3, 4):
        agg_exprs.append(
            F.sum(
                F.when(F.col("n") == n, top_chars).otherwise(F.lit(0))
            ).alias(f"_top{n}")
        )
    for n in (5, 6, 7, 8, 9, 10):
        agg_exprs.append(
            F.sum(
                F.when(F.col("n") == n, F.col("dup_chars")).otherwise(
                    F.lit(0)
                )
            ).alias(f"_dup{n}")
        )
    gram_stats = per_n.groupBy("id").agg(*agg_exprs)

    out = (
        total.join(line_stats, "id", "left").join(gram_stats, "id", "left")
    )
    tc = F.greatest(F.col("total_chars"), F.lit(1)).cast("double")
    nl = F.greatest(F.coalesce(F.col("n_lines"), F.lit(0)), F.lit(1))
    lchars = F.greatest(
        F.coalesce(F.col("line_chars"), F.lit(0)), F.lit(1)
    ).cast("double")
    cols = [F.col("id")]
    flags = []
    dlf = F.coalesce(F.col("dup_lines"), F.lit(0)) / nl.cast("double")
    dlcf = F.coalesce(F.col("dup_line_chars"), F.lit(0)) / lchars
    for name, frac in (
        ("dup_line_fraction", dlf),
        ("dup_line_char_fraction", dlcf),
    ):
        cols.append(F.round(frac, 6).alias(name))
        ok = (frac <= th[name]).alias(f"ok_{name}")
        flags.append(ok)
    for n in (2, 3, 4):
        frac = F.coalesce(F.col(f"_top{n}"), F.lit(0)) / tc
        name = f"top_{n}gram_char_fraction"
        cols.append(F.round(frac, 6).alias(name))
        flags.append((frac <= th[name]).alias(f"ok_{name}"))
    for n in (5, 6, 7, 8, 9, 10):
        frac = F.coalesce(F.col(f"_dup{n}"), F.lit(0)) / tc
        name = f"dup_{n}gram_char_fraction"
        cols.append(F.round(frac, 6).alias(name))
        flags.append((frac <= th[name]).alias(f"ok_{name}"))
    passes = flags[0]
    for fl in flags[1:]:
        passes = passes & fl
    return out.select(
        *cols, *flags, passes.alias("pass_repetition")
    )


def ngram_repetition(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repeated-n-gram ratio per doc — the Gopher/RefinedWeb-style
    repetition signal (most frequent word n-gram count / total n-grams;
    near 1.0 = degenerate boilerplate). Non-distinct n-grams by
    construction, one explode + two hash aggregations; shuffles only
    on (id, ngram) then id."""
    # materialize the words array behind an exchange (expressions
    # referenced inside transform() lambdas re-evaluate per element —
    # same barrier pattern as dedup.word_shingles)
    src = docs.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("w")
    ).repartition(F.col("id"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, n))
    )
    exploded = src.select("id", F.explode(grams).alias("gram"))
    counts = exploded.groupBy("id", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("id").agg(
        F.sum("c").alias("n_ngrams"),
        F.max("c").alias("top_ngram_count"),
        (F.max("c") / F.sum("c")).alias("repetition_ratio"),
    )


def detect_language(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-vote language heuristic with a CJK fast path.

    Deterministic cascade on ties (en ≥ de ≥ es ≥ fr). This is the
    n-gram-heuristic family: cheap, streaming-safe, no model file.
    """
    t = F.col(text_col)
    w = words(t)
    scores = {
        lang: _stopword_hits(w, sws) for lang, sws in LANG_STOPWORDS.items()
    }
    has_cjk = t.rlike("[一-鿿]")
    lang = (
        F.when(has_cjk, F.lit("zh"))
        .when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            F.lit("en"),
        )
        .when(
            (scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]),
            F.lit("de"),
        )
        .when(scores["es"] >= scores["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        F.col(id_col),
        lang.alias("detected_lang"),
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        scores["es"].alias("score_es"),
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(words(t)).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)
        ).alias("n_bpe_tokens"),
    )


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 4,
) -> DataFrame:
    """Content fingerprints: md5 of the normalized text (exact-dup key)
    plus a winnowing-style min-gram fingerprint — the minimum hash over
    all character ``gram``-grams, robust to local edits."""
    norm = normalize_text(F.col(text_col))
    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(norm) - gram + 1, F.lit(1))
        ),
        lambda i: F.md5(norm.substr(i, F.lit(gram))),
    )
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("content_md5"),
        F.array_min(grams).alias("min_gram_fp"),
    )


#: PII patterns — deliberately restricted to syntax with identical
#: semantics in Java regex (Spark) and RE2 (DuckDB): character
#: classes, bounded repetition, ASCII \b and \d, no backreferences or
#: lookaround (RE2 has neither).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PHONE_RE = r"\+\d{7,15}"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub for training corpora: emails, IPv4 addresses, and
    international phone numbers replaced with typed placeholder tokens,
    plus per-category raw-match counts (counted on the ORIGINAL text —
    an email's +digits local part counts under both email and phone).

    Redaction order is fixed (email → ip → phone) so nested matches
    resolve deterministically. Pure regexp_replace/regexp_count —
    stays in whole-stage codegen over every document.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        red.alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
    )


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF keywords per document:
    ``(id, rank, word, tf, df, tfidf)``.

    Two hash aggregations (term counts, then document frequency) + one
    per-doc window. The corpus size joins in as a broadcast 1-row
    aggregate — no driver-side count. Ranking deliberately uses the
    INTEGER key (tf desc, df asc, word asc), not the float score:
    cross-engine ``ln`` differs in the last ulp and could flip
    near-equal scores, while the integer key is total and
    deterministic; the float tf·ln(N/df) is still emitted (rounded)
    as the score column.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
    # single-pass df (r13 opt round): the pre-r13 plan derived df by
    # re-aggregating `tf` — and Spark re-derives an unpersisted
    # subtree per reference, so the corpus was tokenized and
    # aggregated TWICE (two Scan→Generate→HashAggregate chains feeding
    # one join). df is just the per-word row count of `tf` (one row
    # per (id, word)), so a count-over-window partitioned by word
    # computes it in the same pass — ONE tokenize, no tf⋈df join, and
    # the broadcast build of the df table disappears with it. (A
    # persist of `tf` was tried first and measured 1.26× SLOWER at
    # sf0.1 — cache materialization cost more than the recompute it
    # saved; the window costs nothing extra at any scale.)
    tf = toks.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("word"))
    )
    n_docs = docs.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    w = Window.partitionBy("id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("word").asc()
    )
    return (
        scored.crossJoin(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "id",
            "rank",
            "word",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 text retrieval — top-k documents per query string:
    ``(query_id, doc_id, rank, score)``. The text-side twin of the
    vector search family (`similarity.ivf_search_index`): a training
    -data pipeline runs it for benchmark decontamination sweeps,
    near-duplicate triage, and retrieval-based curation where
    embeddings are not available or not trusted.

    Scoring is Robertson/Okapi BM25 (idf = ln(1 + (N − df + 0.5) /
    (df + 0.5)), tf term with ``k1``/``b`` length normalization)
    summed over the query's DISTINCT tokens (query-side tf is
    deliberately ignored — standard for short queries; duplicate
    query words would double-count). ``queries`` carries
    ``(query_id, query_text)``.

    Plan shape: one token explode feeds the per-doc term frequencies
    and document frequencies (two hash aggregations, map-side
    partial); N and avgdl ride in as ONE broadcast 1-row aggregate
    (no driver count); the query⋈corpus join is TERM-keyed — its
    volume is Σ_t df(t) over query terms, which is BM25's inherent
    cost: a stopword query term touches most of the corpus.
    ``max_df_ratio`` is the valve (drop query terms with df >
    ratio·N before the join — classic stopword pruning; changes
    scores for the dropped terms only, default None = exact).

    Ranking orders by the score ROUNDED to 6 decimals with doc-id
    tiebreak: ln() differs across engines in the last ulp (unlike
    +/×/sqrt, it is not IEEE-mandated), so raw-float ordering could
    flip near-exact ties under a differently-built libm, while
    rounded-score ordering is reproducible — the `tfidf_keywords`
    integer-key rationale, adapted to a score that cannot avoid ln.

    ``allowed`` is the FILTERED-retrieval form, the lexical twin of
    `similarity.ivf_search_index(allowed=)`: a one-column (or
    ``id_col``-bearing) table of permitted doc ids, applied to the
    candidates BEFORE ranking so the top-k is the true top-k AMONG
    allowed docs. Collection statistics (df, N, avgdl) deliberately
    stay FULL-corpus — the filter restricts who may be retrieved, not
    the language model of the collection (what production engines do:
    a metadata filter must not re-weight idf), and it is also the
    only semantics a persisted index can serve without re-aggregating
    stats per query. Unlike filtered ANN there is NO recall trade and
    no starvation signal: term postings are exact, so fewer than k
    results simply means fewer than k allowed docs share any query
    term — a property of the data, not of an approximation.
    """
    tf, totals = _bm25_surfaces(docs, text_col, id_col)
    qterms = _bm25_query_terms(queries)
    return _bm25_rank(
        qterms, tf, totals, k, k1, b, max_df_ratio, id_col,
        allowed=allowed,
    )


def _bm25_surfaces(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(tf, totals) — the in-session corpus surfaces behind
    `bm25_topk` and `bm25_prf_topk`: one tokenize pass feeding the
    per-(doc, term) counts and the 1-row (N, avgdl) aggregate,
    extracted so the two operators' tokenization and length
    accounting cannot drift."""
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        tokenize(F.col(text_col)).alias("_ws"),
    )
    # NO persist of tf (r13 opt round, tried and reverted with
    # numbers): caching the (doc, dl, term, tf) aggregate measured
    # 1.13–1.16× SLOWER across the whole BM25 family at sf0.1. The
    # reason the recompute is cheap here: the scoring pass never
    # shuffles tf — query terms broadcast against it — so each extra
    # reference costs one map-side tokenize pass, while the cache
    # costs a full materialization plus the lost codegen fusion. A
    # corpus queried repeatedly should use the PERSISTED postings
    # index (`write_bm25_index`), which is this cut point done
    # properly — on disk, once.
    tf = (
        toks.select(
            "_doc", F.size("_ws").alias("_dl"), F.explode("_ws").alias("_w")
        )
        .groupBy("_doc", "_dl", "_w")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size("_ws")).alias("_avgdl"),
    )
    return tf, totals


def _bm25_query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, _w) — DISTINCT tokens per query (query-side tf is
    ignored; see `bm25_topk`)."""
    return queries.select(
        "query_id",
        F.explode(F.array_distinct(tokenize(F.col("query_text")))).alias(
            "_w"
        ),
    )


def _bm25_rank(
    qterms: DataFrame,
    tf: DataFrame,
    totals: DataFrame,
    k: int,
    k1: float,
    b: float,
    max_df_ratio: float | None,
    id_col: str,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """The ONE Okapi scoring tree behind `bm25_topk` (in-session) and
    `bm25_search_index` (persisted postings) — both paths must rank
    identically, so the idf/tf-normalization/round/tiebreak expressions
    live here. ``tf`` carries ``(_doc, _dl, _w, _tf)``; ``totals`` is
    the 1-row ``(_n, _avgdl)`` broadcast. df is derived from ``tf``
    (count of docs per term), so a caller that pre-filters ``tf`` to
    the query terms' buckets still gets exact df — every posting for
    those terms lives in their buckets.

    ``allowed`` filters the candidate postings AFTER df is derived
    (full-collection statistics, see `bm25_topk`) and BEFORE the
    ranking window — top-k among allowed docs, never a post-filtered
    unconstrained top-k. Join strategy is left to Catalyst/AQE: the
    allowed side may be corpus-sized.

    A ``_qw`` column on ``qterms`` weights each query term's
    contribution (`bm25_prf_topk`'s expansion weights — 1.0 for
    original terms, the feedback weight for mined terms); absent,
    every term weighs 1.0 (all other callers)."""
    # df's count deliberately references _tf (count(when(_tf >= 1, 1))
    # ≡ count(1): _tf is a count, always ≥ 1): without the reference,
    # column pruning drops the partial_count from THIS branch's copy of
    # the tf aggregate, its pre-exchange plan stops being
    # canonical-equal to the scoring branch's, and AQE's stage reuse
    # cannot fire — the corpus is then tokenized+shuffled TWICE (one
    # full pass per branch). With it, both branches read ONE reused
    # (_doc,_dl,_w) exchange (guide §2.4; measured: 1 ReusedExchange,
    # one fewer corpus scan, byte-identical output).
    df = tf.groupBy("_w").agg(
        F.count(F.when(F.col("_tf") >= 1, 1)).alias("_df")
    )
    if allowed is not None:
        ids = (
            allowed.select(F.col(id_col).alias("_doc"))
            if id_col in allowed.columns
            else allowed.select(F.col(allowed.columns[0]).alias("_doc"))
        )
        # no .distinct(): a left-semi join already matches each tf row
        # at most once whatever the build side holds, and the allowed
        # side may be corpus-sized — a dedup there is a wasted
        # shuffle+aggregate
        tf = tf.join(ids, "_doc", "left_semi")
    scored = qterms.join(df, "_w").crossJoin(F.broadcast(totals))
    if max_df_ratio is not None:
        scored = scored.filter(
            F.col("_df") <= F.lit(max_df_ratio) * F.col("_n")
        )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("_tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("_tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("_dl") / F.col("_avgdl")
            )
        )
    )
    if "_qw" in qterms.columns:
        contrib = contrib * F.col("_qw")
    per_pair = (
        scored.join(tf, "_w")
        .groupBy("query_id", "_doc")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("_doc").asc()
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("_doc").alias(id_col), "rank", "score")
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Standard ranked-retrieval evaluation — one row per query with
    ``ndcg_at_k``, ``mrr`` and ``n_rel_in_k`` — over ANY ranked list
    this engine produces (`bm25_topk` / `bm25_search_index` /
    `ivf_search_index` / `rrf_fuse` / `mmr_rerank` output; pass
    ``id_col`` to match). The offline eval harness a retrieval
    deployment runs against judged queries, complementing
    `similarity.ann_recall_eval` (which measures recall of the exact
    top-k — a property of the INDEX) with graded ranking quality — a
    property of the SCORING (Järvelin & Kekäläinen, "Cumulated
    Gain-Based Evaluation of IR Techniques", TOIS 2002).

    ``qrels`` carries ``(query_col, id_col, rel_col)`` integer graded
    relevance. Definitions, deterministic and engine-replayable:

    - DCG@k  = Σ over result ranks r ≤ k of (2^rel − 1) / log2(r + 1)
      (unjudged docs count rel 0 — the standard convention);
    - IDCG@k = the same sum over the query's qrels sorted rel-DESC,
      truncated at k (ties among equal rel cannot change the value,
      so no tiebreak is needed for determinism);
    - nDCG@k = ROUND(DCG/IDCG, 6), and 0.0 when the query has no
      positive qrels (IDCG = 0 — scoring an unjudgeable query 0 keeps
      the mean honest rather than silently dropping it; filter
      upstream if exclusion is wanted);
    - MRR    = ROUND(1 / first rank with rel > 0, 6), 0.0 if none
      retrieved in the list;
    - n_rel_in_k = judged-positive results at rank ≤ k.

    The ROUND(…, 6) is the module's ln-reproducibility contract
    (log2 = ln ratio; ln is not IEEE-mandated cross-engine — the
    `bm25_topk` rationale). Plan shape: results≤k left-join qrels on
    (query, doc) + one aggregation, and an IDCG window over qrels
    partitioned by query — all shuffles on the query key; qrel sets
    are bounded by judgment effort, never corpus-sized.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    )
    j = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rel_col).alias("_rel"),
    )
    joined = r.join(j, ["_q", "_d"], "left").withColumn(
        "_rel", F.coalesce(F.col("_rel"), F.lit(0))
    )
    gain = (F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)) / F.log2(
        F.col("_r") + F.lit(1.0)
    )
    per_q = joined.groupBy("_q").agg(
        F.sum(gain).alias("_dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_r"))).alias("_first"),
        F.count(F.when(F.col("_rel") > 0, F.lit(1))).alias(
            "n_rel_in_k"
        ),
    )
    wi = Window.partitionBy("_q").orderBy(F.col("_rel").desc())
    ideal = (
        j.filter(F.col("_rel") > 0)
        .withColumn("_ir", F.row_number().over(wi))
        .filter(F.col("_ir") <= k)
        .groupBy("_q")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0))
                / F.log2(F.col("_ir") + F.lit(1.0))
            ).alias("_idcg")
        )
    )
    return (
        per_q.join(ideal, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.round(
                F.when(
                    F.col("_idcg").isNull() | (F.col("_idcg") == 0),
                    F.lit(0.0),
                ).otherwise(F.col("_dcg") / F.col("_idcg")),
                6,
            ).alias("ndcg_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("_first"), F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
            "n_rel_in_k",
        )
    )


def _hard_negatives(
    hits: DataFrame,
    qrels: DataFrame,
    n_negatives: int,
    query_col: str,
    id_col: str,
    rel_col: str,
) -> DataFrame:
    """Shared post-retrieval core of both hard-negative fronts: drop
    judged-positive docs from the ranked hits, re-rank the survivors
    by retrieval rank. The neg_rank window shares the rank window's
    query-key partitioning — no extra shuffle beyond the qrels
    anti-join (qrels are judgment-bounded, broadcast-sized in
    practice)."""
    positives = qrels.filter(F.col(rel_col) > 0).select(
        query_col, id_col
    )
    negs = hits.join(positives, [query_col, id_col], "left_anti")
    w = Window.partitionBy(query_col).orderBy(F.col("rank").asc())
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_negatives)
        .select(query_col, id_col, "score", "neg_rank")
    )


def mine_hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    qrels: DataFrame,
    n_negatives: int = 5,
    depth: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query_id",
    rel_col: str = "rel",
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training data —
    per judged query, the ``n_negatives`` TOP-RANKED retrieved docs
    that are NOT judged relevant: ``(query_id, doc_id, score,
    neg_rank)``. The standard dense-retrieval recipe (DPR, Karpukhin
    et al. EMNLP 2020 §3.2 "BM25 hard negatives"; sentence-
    transformers mine the same way): lexically close but unjudged
    docs make far stronger contrastive negatives than random samples,
    and mining them over the full corpus is exactly the kind of job
    that runs at 100 TB — one BM25 retrieval pass (`bm25_topk` — the
    term-keyed join is the inherent cost; ``max_df_ratio`` is the
    stopword valve) + a judgment-bounded anti-join.

    ``depth`` is the retrieval pool per query (mine from the top-20,
    keep 5 — deeper pools trade harder negatives for more
    false-negative risk: an unjudged-but-relevant doc at rank 2 is
    likelier than at rank 20). ``qrels`` carries ``(query_col,
    id_col, rel_col)``; rows with ``rel_col > 0`` are positives and
    are excluded — unjudged and rel-0 docs are fair negatives (the
    DPR convention). Training pairs come from joining the output back
    to the positives; this operator deliberately emits only the mined
    negative side."""
    hits = bm25_topk(
        docs, queries, k=depth, k1=k1, b=b, text_col=text_col,
        id_col=id_col, max_df_ratio=max_df_ratio,
    )
    return _hard_negatives(
        hits, qrels, n_negatives, query_col, id_col, rel_col
    )


def mine_hard_negatives_index(
    queries: DataFrame,
    qrels: DataFrame,
    path: str,
    n_negatives: int = 5,
    depth: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    query_col: str = "query_id",
    rel_col: str = "rel",
    max_df_ratio: float | None = None,
) -> DataFrame:
    """`mine_hard_negatives` against a persisted BM25 index — the
    production path (nightly mining over a standing corpus index
    instead of re-aggregating tf/df per run): the retrieval pass is
    `bm25_search_index`'s bucket-pruned probe, the post-processing is
    the shared `_hard_negatives` core, so results are value-identical
    to the in-session form over the same corpus (the llm_bm25_index
    equivalence, pinned in tests).

    ``max_df_ratio`` passes straight through to the probe — at scale,
    run it at `valves.recommended("mine_hard_negatives",
    "max_df_ratio")` (0.5, bm25's stopword judgment): unvalved, a
    stopword-grade query term drags corpus-sized postings into the
    mine (measured 11.6× at the 100× decade vs 7.6× valved —
    SCALE.md `hard_negatives_probe_pruned`)."""
    spark = queries.sparkSession
    id_col = _resolve_bm25_index(spark, path)[0]["id_col"]
    hits = bm25_search_index(
        queries, path, k=depth, k1=k1, b=b,
        max_df_ratio=max_df_ratio,
    )
    return _hard_negatives(
        hits, qrels, n_negatives, query_col, id_col, rel_col
    )


def build_contrastive_pairs(
    qrels: DataFrame,
    negatives: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """Contrastive training triples ``(query_id, pos_id, neg_id,
    neg_rank)`` — the emitter that turns judged positives + mined
    hard negatives into DPR/sentence-transformers training data
    (Karpukhin et al. EMNLP 2020 §3: each example pairs a positive
    passage with hard negatives). Every judged positive (``rel > 0``)
    of a query crosses with every mined negative of the SAME query —
    a query-keyed hash join, output bounded by
    |positives| × n_negatives per query; queries with no mined
    negatives (or no positives) emit nothing, by construction of the
    inner join. Feed `mine_hard_negatives`(+`_index`) output as
    ``negatives``."""
    positives = qrels.filter(F.col(rel_col) > 0).select(
        query_col, F.col(id_col).alias("pos_id")
    )
    negs = negatives.select(
        query_col, F.col(id_col).alias("neg_id"), "neg_rank"
    )
    return positives.join(negs, query_col)


def bm25_prf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    fb_weight: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """BM25 with pseudo-relevance-feedback query expansion — the
    Rocchio/RM3 family (Rocchio 1971; Lavrenko & Croft, "Relevance-
    Based Language Models", SIGIR 2001): run the query, assume the
    top ``fb_docs`` results are relevant, mine their most frequent
    terms, and re-run the query expanded with those terms at weight
    ``fb_weight``. The classic fix for vocabulary mismatch ("car"
    retrieving documents that only say "automobile"), and the lexical
    stack's recall lever — a decontamination or curation sweep that
    must not miss paraphrases runs PRF where embeddings are absent.

    Deterministic by construction, like everything the oracle replays:
    pass 1 is `bm25_topk`'s exact ranking (rounded score + id
    tiebreak); feedback terms are ranked per query by their INTEGER
    summed tf across the feedback docs with a term-string tiebreak
    (no float ordering anywhere in the selection); a mined term that
    is already a query term keeps weight 1.0 (max-weight dedup);
    ``fb_weight`` should be a binary fraction (the default 0.5 is
    exact in floating point) so the weighted contribution stays
    bit-reproducible. Pass 2 is the shared `_bm25_rank` tree with the
    per-term ``_qw`` weights.

    Plan shape: the tf/df/totals surfaces are built once and consumed
    by both passes (two corpus-lineage scans — the honest PRF cost:
    production engines pay the same second round trip); the feedback
    join's left side is |queries| × fb_docs rows (broadcast-sized),
    and the mined-term aggregation output is ≤ |queries| × fb_terms.
    ``max_df_ratio``/``allowed`` pass through to BOTH passes with
    their usual semantics, and the valve additionally prunes the
    MINING POOL itself (stopword-grade terms are excluded before the
    fb_terms window, not merely dropped from scoring afterwards —
    otherwise mined stopwords would fill every expansion slot and
    silently degrade PRF to plain BM25 on exactly the
    natural-language corpora it targets).

    The persisted-index form is deliberately absent: mining feedback
    terms needs doc → terms (a forward index), which the term-bucketed
    postings layout cannot serve without a full scan — a deployment
    runs PRF in-session over the corpus (as here) or materializes a
    forward index beside the inverted one.
    """
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1: {fb_docs}")
    if fb_terms < 0:
        raise ValueError(f"fb_terms must be >= 0: {fb_terms}")
    if not 0.0 < fb_weight <= 1.0:
        raise ValueError(f"fb_weight must be in (0, 1]: {fb_weight}")
    tf, totals = _bm25_surfaces(docs, text_col, id_col)
    qterms = _bm25_query_terms(queries)
    feedback = _bm25_rank(
        qterms, tf, totals, fb_docs, k1, b, max_df_ratio, id_col,
        allowed=allowed,
    ).select("query_id", F.col(id_col).alias("_doc"))
    # per-query mined terms: INTEGER tf sums over the feedback docs,
    # term-string tiebreak — no float enters the selection
    mined_src = feedback.join(tf.select("_doc", "_w", "_tf"), "_doc")
    if max_df_ratio is not None:
        # the valve applies AT MINING TIME too: feedback docs' highest
        # -tf terms are stopwords on exactly the natural-language
        # corpora PRF targets, and mined stopwords would either fill
        # every fb_terms slot only to be dropped by pass 2's df filter
        # (silently degrading PRF to plain BM25) or, unvalved, add
        # noise terms — prune the mining pool by the same df rule
        # count references _tf for the same reason as `_bm25_rank`'s
        # df: keep this branch's copy of the tf aggregate
        # canonical-equal to the others so AQE stage reuse fires
        # (count(when(_tf >= 1, 1)) ≡ count(1); _tf ≥ 1 always)
        dfreq = tf.groupBy("_w").agg(
            F.count(F.when(F.col("_tf") >= 1, 1)).alias("_df")
        )
        mined_src = (
            mined_src.join(dfreq, "_w")
            .crossJoin(F.broadcast(totals.select("_n")))
            .filter(F.col("_df") <= F.lit(max_df_ratio) * F.col("_n"))
            .drop("_df", "_n")
        )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("_fbtf").desc(), F.col("_w").asc()
    )
    mined = (
        mined_src.groupBy("query_id", "_w")
        .agg(F.sum("_tf").alias("_fbtf"))
        .withColumn("_r", F.row_number().over(wt))
        .filter(F.col("_r") <= fb_terms)
        .select(
            "query_id", "_w",
            F.lit(float(fb_weight)).cast("double").alias("_qw"),
        )
    )
    expanded = (
        qterms.withColumn("_qw", F.lit(1.0))
        .unionByName(mined)
        # a mined term that is already a query term keeps the original
        # weight (max); also dedups the union
        .groupBy("query_id", "_w")
        .agg(F.max("_qw").alias("_qw"))
    )
    return _bm25_rank(
        expanded, tf, totals, k, k1, b, max_df_ratio, id_col,
        allowed=allowed,
    )


def rrf_fuse(
    results: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of ranked result lists —
    ``(query_id, doc_id, rank, rrf_score)``: the standard way to
    combine a lexical ranking (`bm25_topk`) with a vector ranking
    (`similarity.ivf_search_index` / `brute_force_topk`) without
    comparable scores (Cormack, Clarke & Buettcher, SIGIR 2009:
    score = Σ_lists 1/(c + rank), c=60). Rank positions are the only
    input, so wildly different score scales fuse cleanly — the
    hybrid-retrieval default.

    Each input carries ``(query_col, id_col, rank_col)`` (rename a
    vector leg's ``match_id`` first). A (query, doc) absent from a
    list simply contributes nothing — the union/groupBy form, so any
    number of legs fuse in ONE shuffle on (query, doc), never a
    per-pair join chain. Output ranks on the ROUNDED score with id
    tiebreak (1/(c+rank) is exact IEEE division, but cross-list sums
    can land differently ordered across engines — last-ulp guard,
    same rationale as `bm25_topk`).
    """
    if not results:
        raise ValueError("rrf_fuse needs at least one result list")
    legs = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("_doc"),
            F.col(rank_col).alias("_r"),
        )
        for r in results
    ]
    unioned = legs[0]
    for leg in legs[1:]:
        unioned = unioned.unionByName(leg)
    fused = unioned.groupBy("query_id", "_doc").agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("_r"))), 6
        ).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("_doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("_doc").alias(id_col), "rank", "rrf_score"
        )
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-proxy quality score: per-document mean unigram
    log-probability under the corpus' own unigram LM —
    ``(id, n_tokens, avg_logprob)``. Low scores flag gibberish /
    boilerplate; the statistical-LM filter of a training-data
    pipeline.

    Plan: one token explode feeds both the vocabulary aggregate and
    the per-doc join; the corpus token total rides in as a broadcast
    1-row aggregate. avg_logprob = mean(ln(freq_w) - ln(N)) — summed
    as doubles, so only round the OUTPUT, never intermediate terms.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        toks.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(
                F.log(F.col("freq")) - F.log(F.col("n_total"))
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Bigram Stupid-Backoff LM score per document — ``(id,
    n_scored, avg_logprob)``: for each adjacent token pair (a, b),
    ``ln(c(ab)/c(a·))`` when the LM corpus saw the bigram, else
    ``ln(backoff · c(b)/N)`` (Brants et al., "Large Language Models
    in Machine Translation", EMNLP 2007 — the smoothing that actually
    scales: no discount estimation, just counts). The KenLM-tier
    upgrade over `unigram_logprob`: word-salad whose WORDS are common
    but whose TRANSITIONS are not (shuffled text, keyword stuffing)
    scores high under unigrams and low here.

    ``lm_docs`` is the REFERENCE corpus the counts come from — the
    production shape (score this month's crawl under last month's
    trusted corpus; that is when the backoff branch carries the
    signal). Default None scores ``docs`` under its own counts, where
    every transition is by construction seen (the backoff branch is
    provably dead — fine for relative ranking, stated so nobody
    mistakes self-scoring for held-out scoring). OOV continuation
    words (absent from the LM entirely) take an add-one floor:
    ``c(b)`` coalesces to 1 before the backoff term — deterministic
    and replayable, never ln(0).

    ``n_scored`` counts scored transitions (tokens − 1 per doc);
    single-token and empty docs emit no row (no transition to score —
    absence is the honest "unscorable", not a fake 0). Context count
    is ``c(a·)`` — a's count AS A CONTEXT (bigrams starting with a),
    so seen-bigram probabilities sum to exactly 1 per context. Only
    the OUTPUT is rounded (6 dp, the module's ln contract)."""

    def _toks(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col).alias("id"),
            F.posexplode(tokenize(F.col(text_col))).alias("pos", "w"),
        )

    def _bigrams(t: DataFrame) -> DataFrame:
        win = Window.partitionBy("id").orderBy("pos")
        return (
            t.withColumn("w_next", F.lead("w").over(win))
            .filter(F.col("w_next").isNotNull())
            .select(
                "id",
                F.col("w").alias("a"),
                F.col("w_next").alias("b"),
            )
        )

    lm_toks = _toks(lm_docs) if lm_docs is not None else _toks(docs)
    lm_bi = _bigrams(lm_toks)
    bi = _bigrams(_toks(docs)) if lm_docs is not None else lm_bi
    bi_counts = lm_bi.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    ctx_counts = lm_bi.groupBy("a").agg(
        F.count(F.lit(1)).alias("c_a")
    )
    uni = lm_toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    total = lm_toks.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        bi.join(bi_counts, ["a", "b"], "left")
        .join(ctx_counts, "a", "left")
        .join(uni.withColumnRenamed("w", "b"), "b", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.when(
                F.col("c_ab").isNotNull(),
                F.log(F.col("c_ab") / F.col("c_a")),
            )
            .otherwise(
                F.log(
                    F.lit(float(backoff))
                    * F.coalesce(F.col("c_w"), F.lit(1))
                    / F.col("n_total")
                )
            )
            .alias("_lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """BPE merge-candidate statistics — corpus-wide frequency of every
    adjacent CHARACTER pair, the quantity one byte-pair-encoding merge
    iteration maximizes (Sennrich et al., "Neural Machine Translation
    of Rare Words with Subword Units", ACL 2016 — ``get_stats`` over
    the word histogram): ``(pair, n)``, optionally the deterministic
    top-``top_n`` (n DESC, pair ASC — a distributed TakeOrdered,
    never a global window).

    The tokenizer-training prep step a 100 TB pipeline actually runs:
    ONE corpus-scale pass builds the word histogram (token explode +
    hash aggregate — the same shape as `unigram_logprob`'s vocab),
    and the pair pass then costs O(|vocab| · word_len), corpus-size-
    independent — the standard histogram trick (SentencePiece / HF
    tokenizers train from word counts, not raw text). Pairs count
    WITH multiplicity within a word ("aaa" contributes "aa" twice),
    weighted by word frequency — the reference algorithm's exact
    accounting. Single-char words contribute no pairs and are
    filtered before the histogram. Full BPE training iterates
    merge-apply-recount on the DRIVER over the bounded histogram;
    this operator is the corpus-facing distributed step.
    """
    words = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # ascending by construction (length >= 2 ⇒ stop >= 1): sequence()
    # would silently generate DESCENDING for shorter words
    pair_arr = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.col("word").substr(i, F.lit(2)),
    )
    out = (
        words.select(F.explode(pair_arr).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )
    if top_n is not None:
        out = out.orderBy(
            F.col("n").desc(), F.col("pair").asc()
        ).limit(top_n)
    return out


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Full BPE merge-rule training: ONE distributed pass builds the
    corpus word histogram, then the merge loop runs on the DRIVER
    over that bounded histogram — exactly the reference algorithm
    (Sennrich ACL 2016; SentencePiece/HF train from word counts the
    same way), with the corpus-scale work in the right place: the
    histogram is the only pass that touches 100 TB, and each merge
    iteration is O(|vocab|) driver CPU, corpus-size-independent.

    Returns the ordered merge rules ``[(left, right), ...]`` —
    iteration 1's rule is by construction `bpe_pair_counts`' top pair
    (pinned in tests). Tiebreak is (count DESC, pair ASC), making the
    rules deterministic cross-run. ``max_vocab_rows`` guards the
    bounded driver read (the `max_benchmark_rows` pattern): the count
    check runs BEFORE the collect, so an unexpectedly unbounded
    vocabulary raises instead of OOMing the driver — raise the cap
    deliberately, or pre-filter the tail (min_freq) upstream."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    hist_df = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).persist()
    try:
        n_vocab = hist_df.count()
        if n_vocab > max_vocab_rows:
            raise ValueError(
                f"word histogram has {n_vocab} rows > max_vocab_rows="
                f"{max_vocab_rows} — raise the cap deliberately or "
                "pre-filter rare words before training"
            )
        hist = [
            (tuple(r["word"]), r["freq"]) for r in hist_df.collect()
        ]
    finally:
        hist_df.unpersist()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in hist:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_hist = []
        for syms, freq in hist:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_hist.append((tuple(out), freq))
        hist = new_hist
    return merges


#: BPE encode framing chars (control plane of the symbol string):
#: \x00 separates words, \x01/\x02 bracket each symbol. Tokens can
#: never contain them (tokenize splits on whitespace only, but these
#: are asserted at encode time anyway).
_BPE_W, _BPE_L, _BPE_R = "\x00", "\x01", "\x02"


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "auto",
    max_expr_rules: int = 64,
) -> DataFrame:
    """Segment a corpus with trained BPE merge rules →
    ``(id, tokens array<string>, n_tokens)`` — the encode half of the
    tokenizer story `bpe_pair_counts`/`train_bpe_merges` start
    (Sennrich ACL 2016 apply step; what SentencePiece/HF do at
    inference). Map-side only: broadcast-by-closure rules, zero
    shuffles, zero joins — the plan is one projection over the scan.

    Greedy application is ITERATIVE (each rule rewrites the symbol
    sequence the next rule sees), which SQL can't express over an
    unbounded rule list — but it IS a chain of LITERAL string
    replaces under the right rendering: each symbol is framed as
    ``\\x01sym\\x02`` and symbols are space-separated (words separated
    by a ``\\x00`` chunk), so rule (a,b) is exactly
    ``replace("\\x01a\\x02 \\x01b\\x02" → "\\x01ab\\x02")`` — framing
    makes a false prefix/suffix match impossible ("xa b" can never
    match rule (a,b): the pattern requires ``\\x01a``, the string has
    ``\\x01xa``), and left-to-right non-overlapping replacement is
    precisely the reference algorithm's scan order
    (`train_bpe_merges`' application loop). Two execution tiers:

    - ``expr`` (default up to ``max_expr_rules``): the replace chain
      as ONE whole-stage-codegen'd column expression — JVM-side, and
      replayable verbatim by DuckDB's ``replace()`` (the driver
      oracle).
    - ``arrow`` (above the cap, e.g. a 50k-rule GPT-2-class
      tokenizer, where a 50k-deep expression tree would break
      codegen): Arrow-batched ``mapInPandas`` applying the same
      greedy scan per DISTINCT word with per-batch memoization —
      corpus cost ~O(distinct words per batch), still map-side.

    Both tiers are pinned value-identical in tests; ids are one
    broadcast dictionary join away (vocab = alphabet + merge outputs
    in rule order) and deliberately out of scope here."""
    if method not in ("auto", "expr", "arrow"):
        raise ValueError(f"unknown method: {method}")
    for a, b in merges:
        for part in (a, b):
            if any(c in part for c in (" ", _BPE_W, _BPE_L, _BPE_R)):
                raise ValueError(
                    f"merge rule {(a, b)!r} contains a framing/space "
                    "char — rules must come from train_bpe_merges over "
                    "whitespace-tokenized text"
                )
    use_expr = method == "expr" or (
        method == "auto" and len(merges) <= max_expr_rules
    )
    if use_expr:
        if len(merges) > max_expr_rules and method == "expr":
            raise ValueError(
                f"{len(merges)} rules > max_expr_rules="
                f"{max_expr_rules}: a replace chain this deep risks "
                "codegen limits — use method='arrow' or raise the cap"
            )
        # NULL text must behave like the arrow tier's coalesce-to-''
        # (→ tokens [], n_tokens 0), not propagate NULL (ADVICE r12)
        joined = F.array_join(
            tokenize(F.coalesce(F.col(text_col), F.lit(""))), _BPE_W
        )
        sym = F.rtrim(
            F.regexp_replace(joined, "(.)", f"{_BPE_L}$1{_BPE_R} ")
        )
        for a, b in merges:
            sym = F.replace(
                sym,
                F.lit(f"{_BPE_L}{a}{_BPE_R} {_BPE_L}{b}{_BPE_R}"),
                F.lit(f"{_BPE_L}{a}{b}{_BPE_R}"),
            )
        toks = F.transform(
            F.filter(
                F.split(sym, " "),
                lambda t: (t != F.lit(""))
                & (t != F.lit(f"{_BPE_L}{_BPE_W}{_BPE_R}")),
            ),
            lambda t: t.substr(F.lit(2), F.length(t) - 2),
        )
        return docs.select(
            F.col(id_col).alias("id"),
            toks.alias("tokens"),
            F.size(toks).alias("n_tokens"),
        )

    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rules = list(merges)
    out_schema = StructType([
        StructField("id", LongType(), False),
        StructField("tokens", ArrayType(StringType()), False),
        StructField("n_tokens", IntegerType(), False),
    ])
    src = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    )

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        for a, b in rules:
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    def _batches(it):
        import re as _re

        memo: dict = {}
        for pdf in it:
            ids, toks_col, n_col = [], [], []
            for iid, txt in zip(pdf["id"], pdf["text"]):
                toks: list[str] = []
                # exactly tokenize()'s contract: lower, split on the
                # ASCII \s+ run (Java's \s), drop empties
                for w in _re.split(
                    r"\s+", str(txt).lower(), flags=_re.ASCII
                ):
                    if not w:
                        continue
                    toks.extend(_encode_word(w, memo))
                ids.append(int(iid))
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {"id": ids, "tokens": toks_col, "n_tokens": n_col}
            )

    return src.mapInPandas(_batches, schema=out_schema)


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    max_alphabet: int = 65_536,
) -> DataFrame:
    """``(token, token_id)`` vocabulary under the SentencePiece/GPT-2
    id convention: the corpus ALPHABET (distinct characters of the
    tokenized text, codepoint-sorted) takes ids ``0..|A|−1``, then
    each merge rule's output takes the next id in FIRST-occurrence
    rule order — distinct pairs sharing a surface form (('a','bc')
    and ('ab','c') both yield 'abc') dedup HF-style to the first
    rule's id, ids staying dense — so ids are stable across corpora
    sharing an alphabet and every symbol `bpe_encode` can emit (a
    base char or a merge output) has exactly one id. One distributed distinct-chars pass; the collect is
    alphabet-bounded and guarded by ``max_alphabet`` (binary garbage
    raises instead of flooding the driver — the max_vocab_rows
    pattern)."""
    chars = (
        docs.select(
            F.explode(
                F.split(
                    F.concat_ws("", tokenize(F.col(text_col))), ""
                )
            ).alias("c")
        )
        .filter(F.col("c") != "")
        .distinct()
    )
    n = chars.count()
    if n > max_alphabet:
        raise ValueError(
            f"corpus alphabet has {n} characters > max_alphabet="
            f"{max_alphabet} — binary or mis-decoded input; raise the "
            "cap deliberately if the charset is real"
        )
    alphabet = sorted(r["c"] for r in chars.collect())
    vocab = [(c, i) for i, c in enumerate(alphabet)]
    seen = {c for c, _ in vocab}
    for a, b in merges:
        out = a + b
        # distinct pairs can legitimately share a surface form — e.g.
        # ('a','bc') and ('ab','c') both yield 'abc' (ADVICE r12).
        # HF-style vocab dedup: the FIRST occurrence keeps its id,
        # later ones are skipped and ids stay dense
        if out in seen:
            continue
        seen.add(out)
        vocab.append((out, len(vocab)))
    return docs.sparkSession.createDataFrame(
        vocab, "token string, token_id int"
    )


def bpe_token_ids(
    encoded: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    out_col: str = "token_ids",
) -> DataFrame:
    """``tokens array<string>`` → ``array<int>`` ids — the words→ids
    step completing `bpe_encode`, as a LITERAL-MAP lookup
    (`map_from_arrays` over the collected vocab: one broadcast-sized
    plan constant, zero joins, zero shuffles — the broadcast
    dictionary join collapsed into the projection). The vocab collect
    is bounded by construction (alphabet + one row per merge rule,
    `bpe_vocab`'s guarantee). A token absent from the vocab maps to
    NULL — impossible when vocab and encode share the corpus and rule
    list, loud under ``array_contains(token_ids, NULL)`` audits when
    they don't."""
    rows = vocab.select("token", "token_id").collect()
    if not rows:
        raise ValueError("empty vocab")
    m = F.map_from_arrays(
        F.lit([r["token"] for r in rows]),
        F.lit([r["token_id"] for r in rows]),
    )
    return encoded.withColumn(
        out_col,
        F.transform(F.col(tokens_col), lambda t: F.element_at(m, t)),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG/pretraining prep
    step that turns documents into overlapping fixed-width token
    windows: ``(doc_id, chunk_id, start_token, n_tokens, chunk_text)``.

    Stride is ``chunk_tokens - overlap``; chunk i covers tokens
    ``[i*stride, i*stride + chunk_tokens)``; the final chunk may be
    shorter; empty docs emit nothing. Chunk count is
    ``1 + ceil_div(max(n - chunk_tokens, 0), stride)`` with pure
    integer arithmetic, so any engine replaying the formula matches
    row-for-row.

    All higher-order functions map-side (sequence → transform → slice
    → explode); no UDF, no shuffle. At 100 TB chunking is
    embarrassingly parallel and output-bounded: ≈ n/stride rows per
    doc, each carrying one window of text.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        # negative overlap means stride > chunk — tokens BETWEEN
        # chunks would silently appear in no window, breaking the
        # full-coverage contract
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    norm = normalize_text(F.col(text_col))
    n = F.size("_ws")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + stride - 1) / stride
    )
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            (i * stride).cast("long").alias("start_token"),
            F.least(
                F.lit(chunk_tokens), n - i * stride
            ).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("_ws"), i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
        ),
    )
    # empty/whitespace-only docs (split('') is [''], size 1) emit an
    # EMPTY windows array, which explode drops — expressed this way,
    # not as a filter on the normalized text, because Catalyst pushes
    # a deterministic filter back through the Project by substitution
    # and re-evaluates the regex chain per row in both operators;
    # with no filter the regex lives in exactly ONE Project
    # (plan-pinned: one regexp_replace).
    is_empty = (n == 1) & (F.element_at("_ws", 1) == F.lit(""))
    chunks = F.when(is_empty, F.slice(windows, 1, 0)).otherwise(windows)
    return (
        docs.select(F.col(id_col), F.split(norm, " ").alias("_ws"))
        .select(id_col, F.explode(chunks).alias("c"))
        .select(
            id_col,
            "c.chunk_id",
            "c.start_token",
            "c.n_tokens",
            "c.chunk_text",
        )
    )


# --------------------------------------------------------------------------
# Persisted inverted text index — the lexical twin of the IVF story:
# term-hash bucket pruning on probes, O(batch) appends, pointer-flip
# rebuilds under sources.manifest.VersionedManifest.
# --------------------------------------------------------------------------


def _bm25_postings(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """(postings, meta) for one corpus batch: postings =
    ``(term, doc, dl, tf, bucket)`` — one row per (doc, term), the
    inverted-index surface — and meta = the 1-row ``(n_docs, sum_dl)``
    corpus-stats fold this batch contributes. ``bucket`` is
    ``xxhash64(term) % n_buckets``: every posting for a term lands in
    ONE bucket, which is what makes probe pruning exact."""
    toks = docs.select(
        F.col(id_col).alias("doc"), tokenize(F.col(text_col)).alias("_ws")
    )
    tf = (
        toks.select(
            "doc", F.size("_ws").alias("dl"), F.explode("_ws").alias("term")
        )
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets))
        )
    )
    meta = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size("_ws")), F.lit(0)).cast("long").alias(
            "sum_dl"
        ),
    )
    return tf, meta


BM25_INDEX_META = "_bm25_index.json"


def _bm25_forward_rows(postings: DataFrame, n_buckets: int) -> DataFrame:
    """``(doc, dl, term, tf, fbucket)`` — the DOC-hash-bucketed
    FORWARD twin of the term-bucketed postings, derived from the same
    tokenize pass: every row of one document lands in its one
    ``fbucket``, so a doc→terms lookup (PRF feedback mining) reads
    |fb docs| buckets via static pruning instead of scanning the
    postings — the forward index the inverted layout cannot emulate
    (`bm25_prf_topk`'s documented gap, closed by
    `bm25_prf_search_index`)."""
    return postings.select(
        "doc", "dl", "term", "tf",
        F.pmod(F.xxhash64(F.col("doc")), F.lit(n_buckets)).alias(
            "fbucket"
        ),
    )


def _bm25_meta_from_payload(
    version: int, payload: dict | None, path: str
) -> tuple[dict, str]:
    """(parameter contract, data root) from a resolved manifest payload
    — shared by the probe resolver and the delete writer so each pays
    exactly one manifest round-trip while keeping the family's
    missing/corrupt errors (the IVF `_ivf_meta_from_payload`
    pattern)."""
    import posixpath as _pp

    if payload is None:
        raise ValueError(
            f"no BM25 index manifest under {path} — not an index "
            "directory (build one with write_bm25_index)"
        )
    try:
        meta = {
            "n_buckets": int(payload["n_buckets"]),
            "id_col": str(payload["id_col"]),
            # absent on pre-r10 manifests: no forward layout
            "forward": bool(payload.get("forward", False)),
        }
        current = str(payload["current"])
    except (ValueError, KeyError, TypeError) as exc:
        raise ValueError(
            f"corrupt BM25 index manifest version {version} under "
            f"{path}: {payload!r}"
        ) from exc
    return meta, _pp.join(path, current)


def _resolve_bm25_index(spark, path: str) -> tuple[dict, str]:
    """(parameter contract, data root) — manifest-committed only (the
    index is r9-new; there is no legacy layout to fall back to)."""
    from ..sources.manifest import VersionedManifest

    version, payload = VersionedManifest(path).resolve(spark)
    return _bm25_meta_from_payload(version, payload, path)


def write_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    forward: bool = False,
) -> None:
    """Persist the inverted text index: ``postings/`` laid out as
    ``batch=<token>/bucket=<h>`` hive partitions (term-hash buckets)
    and ``meta/`` (one ``(n_docs, sum_dl)`` row per batch) — the
    lexical twin of `similarity.write_ivf_index`.

    The layout IS the optimization, same argument as the IVF cells:
    a `bm25_search_index` probe reads ONLY the buckets its query
    terms hash into — |distinct query terms| buckets of ~1/n_buckets
    of the postings each, via static partition pruning — while df for
    those terms stays EXACT (every posting for a term lives in its
    one bucket). Corpus stats (N, avgdl) fold additively across batch
    meta rows, so appends never rescan the corpus. Rebuilds are
    manifest pointer flips; appends land idempotent same-token batch
    dirs (`append_bm25_index`); superseded versions are reclaimed by
    `vacuum_bm25_index`.

    ``forward=True`` additionally persists the DOC-hash-bucketed
    forward layout (`_bm25_forward_rows` — the same tokenize pass laid
    out as ``fbucket=xxhash64(doc)%n``), which `bm25_prf_search_index`
    needs for bucket-pruned feedback-term mining: the inverted
    postings cannot serve doc→terms without a full scan. Roughly
    doubles the index footprint — opt in when PRF runs against this
    index.
    """
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.fs import require_success_marker
    from ..sources.manifest import VersionedManifest

    spark = docs.sparkSession
    vm = VersionedManifest(path)
    version = vm.latest_version(spark)
    rel = _pp.join("versions", f"v{version + 1}-{_uuid.uuid4().hex[:8]}")
    vroot = _pp.join(path, rel)
    postings, meta = _bm25_postings(docs, text_col, id_col, n_buckets)
    if forward:
        # the forward write consumes the SAME postings lineage — an
        # unpersisted plan would re-run the whole tokenize/aggregate
        # (the dominant build cost) for the second write
        postings = postings.persist()
    (
        postings.repartition("bucket")
        .write.mode("errorifexists")
        .partitionBy("bucket")
        .parquet(_pp.join(vroot, "postings", "batch=base"))
    )
    meta.write.mode("errorifexists").parquet(
        _pp.join(vroot, "meta", "batch=base")
    )
    require_success_marker(
        spark, _pp.join(vroot, "postings", "batch=base"), "BM25 index build"
    )
    require_success_marker(
        spark, _pp.join(vroot, "meta", "batch=base"), "BM25 index build"
    )
    if forward:
        (
            _bm25_forward_rows(postings, n_buckets)
            .repartition("fbucket")
            .write.mode("errorifexists")
            .partitionBy("fbucket")
            .parquet(_pp.join(vroot, "forward", "batch=base"))
        )
        postings.unpersist()
        require_success_marker(
            spark,
            _pp.join(vroot, "forward", "batch=base"),
            "BM25 index build",
        )
    payload = {
        "current": rel,
        "n_buckets": n_buckets,
        "id_col": id_col,
        "layout": "batch-v1",
    }
    if forward:
        payload["forward"] = True
    vm.publish_or_raise(spark, payload, version, "BM25 index rebuild")


def _bm25_check_append_ids(
    spark, data_root: str, meta: dict, docs: DataFrame, token: str
) -> None:
    """Raise if any batch doc id is already present in the index — the
    opt-in enforcement of the append-only/new-docs-only contract
    (`append_bm25_index(check_ids=True)`). The lookup is the forward
    layout's bounded probe: the batch ids' doc-hash buckets only
    (static pruning), never a postings scan. This round's calculus
    change: pre-forward, doc identity was unguardable without an
    O(index) scan per append, so the contract was documented only;
    with ``forward=True`` the probe is O(|batch buckets|).

    The SAME token's prior rows are excluded (a same-token retry
    overwrites its own dirs — not a duplicate). Tombstoned-but-not-
    compacted ids still raise, deliberately: that IS the RE-ADD
    contract (a tombstone suppresses its id even in later batches —
    compact first). Because the check runs inside the manifest CAS
    loop, a concurrent fold that commits the same id first causes this
    fold's publish to lose the race, re-resolve, re-check, and raise.

    Only COMPLETE batches (``_SUCCESS`` at the batch dir — the same
    marked-batch rule compact/probe apply) participate: a FOREIGN
    torn append's partial forward rows never committed, so counting
    them would spuriously raise on ids whose fold the crashed ingest's
    own same-token retry is about to rewrite (r11 ADVICE)."""
    import posixpath as _pp

    from ..sources.fs import glob_paths

    batch_ids = (
        docs.select(F.col(meta["id_col"]).alias("doc"))
        .distinct()
        .localCheckpoint()
    )
    fbuckets = sorted(
        r["_b"]
        for r in batch_ids.select(
            F.pmod(F.xxhash64(F.col("doc")), F.lit(meta["n_buckets"]))
            .alias("_b")
        )
        .distinct()
        .collect()
    )
    if not fbuckets:
        return
    marked = sorted(
        p.rsplit("batch=", 1)[1].split("/", 1)[0]
        for p in glob_paths(
            spark, _pp.join(data_root, "forward", "batch=*", "_SUCCESS")
        )
    )
    marked = [t for t in marked if t != token]
    if not marked:
        return
    fwd = (
        spark.read.parquet(_pp.join(data_root, "forward"))
        .filter(F.col("fbucket").isin(fbuckets))
        .filter(F.col("batch").isin(marked))
    )
    sample = [
        r["doc"]
        for r in fwd.join(batch_ids, "doc", "left_semi")
        .select("doc")
        .distinct()
        .limit(10)
        .collect()
    ]
    if sample:
        raise ValueError(
            f"append_bm25_index(check_ids=True): batch doc ids already "
            f"present in the index at {data_root} (sample: {sample}) — "
            "re-ingesting a doc would double-count its postings, df, N "
            "and avgdl. To update documents, use "
            "sync_bm25_index_to_snapshot, or delete_from_bm25_index + "
            "compact_bm25_index before re-appending (the RE-ADD "
            "contract)."
        )


def append_bm25_index(
    docs: DataFrame,
    path: str,
    batch_token: str | None = None,
    text_col: str = "text",
    check_ids: bool = False,
) -> None:
    """Fold a new document batch into the persisted BM25 index without
    a rebuild: tokenize/count the batch only (O(|batch|)), land its
    postings under ``postings/batch=<token>/`` and its 1-row stats
    under ``meta/batch=<token>/``. Same-token retries overwrite their
    own directories (static overwrite — the foreachBatch replay
    contract shared with `append_minhash_index` /
    `similarity.append_ivf_index`); the manifest version bump
    serializes folds against rebuilds. df/N/avgdl all fold additively,
    so probe results after an append are IDENTICAL to a fresh rebuild
    over the union — pinned in TestBm25Index.

    APPEND-ONLY / NEW-DOCS-ONLY contract: the token guards replays of
    the SAME batch, but by default nothing guards doc identity across
    batches — the same ``doc_id`` folded under two different tokens
    double-counts its postings, df, N and avgdl, silently skewing
    every subsequent score (unlike the IVF index, where a duplicate id
    only duplicates a candidate row). Re-ingesting or UPDATING a
    document therefore requires `sync_bm25_index_to_snapshot`, a
    delete → compact → re-append, or a rebuild (`write_bm25_index`
    over the corrected corpus) — the same class of caveat as the IVF
    side's quantizer-doesn't-adapt note on
    `similarity.append_ivf_index`.

    ``check_ids=True`` (requires a ``forward=True`` index) turns that
    one silent-corruption path into a loud error: before writing, the
    fold probes the batch ids' FORWARD buckets (bounded, doc-hash
    pruned — see `_bm25_check_append_ids`) and raises on any overlap
    with committed batches. Off by default: trusted new-docs-only
    ingest (the streaming path, the sync's post-compaction append)
    should not pay the probe."""
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.fs import require_success_marker
    from ..sources.manifest import VersionedManifest

    token = batch_token if batch_token is not None else _uuid.uuid4().hex
    if "/" in token or "=" in token:
        raise ValueError(f"batch_token must be path-safe: {token!r}")
    spark = docs.sparkSession
    vm = VersionedManifest(path)
    for _attempt in range(5):
        version, payload = vm.resolve(spark)
        if payload is None:
            raise ValueError(
                f"no BM25 index manifest under {path} — build one with "
                "write_bm25_index before appending"
            )
        # a compacted-away token is durable in every later base — a
        # replay re-appending it would double-count its postings AND
        # its meta row (see compact_bm25_index's folded contract)
        if token in set(payload.get("folded", ())):
            return
        meta, data_root = _resolve_bm25_index(spark, path)
        if check_ids:
            if not meta["forward"]:
                raise ValueError(
                    f"append_bm25_index(check_ids=True) on {path}: the "
                    "identity probe needs the forward layout — rebuild "
                    "with write_bm25_index(forward=True)"
                )
            _bm25_check_append_ids(spark, data_root, meta, docs, token)
        postings, stats = _bm25_postings(
            docs, text_col, meta["id_col"], meta["n_buckets"]
        )
        if meta["forward"]:
            # two writes consume this lineage — persist or the batch
            # tokenize/aggregate runs twice (see write_bm25_index)
            postings = postings.persist()
        pdir = _pp.join(data_root, "postings", f"batch={token}")
        (
            postings.repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("bucket")
            .parquet(pdir)
        )
        mdir = _pp.join(data_root, "meta", f"batch={token}")
        stats.write.mode("overwrite").parquet(mdir)
        require_success_marker(spark, pdir, "BM25 fold")
        require_success_marker(spark, mdir, "BM25 fold")
        if meta["forward"]:
            # the forward twin folds the same batch rows, so PRF
            # mining sees appended docs the moment the fold commits
            fdir = _pp.join(data_root, "forward", f"batch={token}")
            (
                _bm25_forward_rows(postings, meta["n_buckets"])
                .repartition("fbucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("fbucket")
                .parquet(fdir)
            )
            postings.unpersist()
            require_success_marker(spark, fdir, "BM25 fold")
        if vm.publish(spark, payload, version):
            vm.vacuum_superseded(spark)
            return
    raise RuntimeError(
        f"BM25 index fold {token!r} at {path} lost the manifest race "
        "5 times in a row — pause rebuilds and retry"
    )


def _bm25_tombstone_ids(spark, data_root: str) -> DataFrame | None:
    """Doc ids deleted from this index version
    (`delete_from_bm25_index`), or None when no complete tombstone
    batch exists — one column ``doc``, matching the postings surface;
    the shared `tombstones.read_tombstone_ids` completeness rule."""
    from .tombstones import read_tombstone_ids

    return read_tombstone_ids(spark, data_root, "doc")


def delete_from_bm25_index(
    ids: DataFrame,
    path: str,
    delete_token: str | None = None,
) -> None:
    """Delete documents from the persisted BM25 index WITHOUT a
    rebuild — the retraction path (takedowns, right-to-be-forgotten,
    license revocation) the append-only fold cannot serve, and the
    lexical twin of `similarity.delete_from_ivf_index`.

    Deletes are TOMBSTONES (the Lucene deleted-docs model): ids land
    in an idempotent ``tombstones/batch=<token>/`` directory of the
    current version — O(|deleted|), the postings are untouched — and
    `bm25_search_index` anti-joins them out of the probed postings
    BEFORE scoring. The score contract until compaction, exactly
    Lucene-before-merge except stronger on df:

    - a deleted doc is never retrieved, and its postings are pruned
      before the df aggregation, so **df is exact post-delete** for
      every probed term (df folds from the probed buckets' surviving
      rows, not from stored counts);
    - **N and avgdl stay build-time** (they fold from the tiny
      ``meta/`` rows, which a tombstone cannot see into) — scores
      carry a collection-stats bias bounded by the deleted fraction
      until `compact_bm25_index` runs.

    Compaction applies tombstones physically AND corrects N/sum_dl
    exactly from the dropped postings (each deleted doc's ``dl``
    travels on its posting rows), so a post-compaction probe is
    value-identical to a fresh `write_bm25_index` over the surviving
    corpus — pinned in TestBm25Deletes. The one honest residual: a
    deleted doc with ZERO tokens has no posting rows to correct from,
    so it keeps inflating N until a true rebuild (it can never match
    a query, so only the shared idf/avgdl scale is off, by at most
    the empty-doc fraction).

    ``ids`` is a one-column DataFrame (or any DataFrame carrying the
    index's id column). Same-token retries overwrite their own batch
    dir; the manifest version bump serializes deletes against
    compactions/resizes; compacted-away tokens are durable in the
    ``folded_deletes`` list (disjoint from the append tokens'
    ``folded`` — see `similarity.delete_from_ivf_index`) so replays
    no-op. RE-ADD contract: a tombstone suppresses its doc id wherever
    it lives, including batches folded after the delete — re-adding a
    deleted id requires compacting first, the delete-side twin of
    `append_bm25_index`'s new-docs-only note.
    """
    from .tombstones import tombstone_delete

    def _resolve(spark, version, payload):
        meta, data_root = _bm25_meta_from_payload(version, payload, path)
        return data_root, meta["id_col"], "doc"

    tombstone_delete(ids, path, delete_token, "BM25 delete", _resolve)


def vacuum_bm25_index(spark, path: str) -> list[str]:
    """Reclaim superseded BM25 index versions (same contract as
    `vacuum_minhash_index` / `similarity.vacuum_ivf_index`)."""
    from ..sources.manifest import VersionedManifest

    return VersionedManifest(path).vacuum_versions(
        spark,
        ("postings", "meta", "forward", "tombstones", BM25_INDEX_META),
    )


def bm25_search_index(
    queries: DataFrame,
    path: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """`bm25_topk` against a persisted `write_bm25_index` layout —
    identical ranking (the scoring tree is shared, `_bm25_rank`), but
    the postings side reads ONLY the buckets the query's terms hash
    into: the distinct query terms' bucket ids are collected to the
    driver (bounded by the query set's vocabulary — queries are a
    bounded set by contract, same as every probe here) and pushed as
    a static partition filter, so a 3-term query over a 64-bucket
    index scans ≤ 3/64 of the postings bytes regardless of corpus
    size. df for the probed terms is exact (a term's every posting
    lives in its one bucket); N and avgdl fold from the tiny per-batch
    ``meta/`` rows — one broadcast row, no corpus scan.

    ``allowed`` is the filtered-retrieval form, identical semantics to
    `bm25_topk(allowed=)`: candidates restricted BEFORE ranking,
    collection statistics (df/N/avgdl) untouched — which is exactly
    what the persisted layout serves without per-query re-aggregation
    (df folds from the probed buckets whole; the filter only prunes
    who may be retrieved)."""
    spark = queries.sparkSession
    meta, data_root = _resolve_bm25_index(spark, path)
    qterms = _bm25_query_terms(queries).localCheckpoint()
    return _bm25_index_probe(
        spark, data_root, meta, qterms, k, k1, b, max_df_ratio, allowed
    )


def _bm25_index_probe(
    spark,
    data_root: str,
    meta: dict,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
    max_df_ratio: float | None,
    allowed: DataFrame | None,
) -> DataFrame:
    """The ONE persisted-probe core behind `bm25_search_index` and
    both passes of `bm25_prf_search_index`: fold N/avgdl from the
    per-batch ``meta/`` rows, collect the query terms' bucket ids
    (bounded driver read), scan only those postings buckets, prune
    tombstones, rank via the shared `_bm25_rank` tree. ``qterms`` may
    carry the ``_qw`` expansion-weight column — it flows through to
    the weighted scoring."""
    import posixpath as _pp

    stats = (
        spark.read.parquet(_pp.join(data_root, "meta"))
        .agg(
            F.sum("n_docs").alias("_n"),
            (F.sum("sum_dl") / F.sum("n_docs")).alias("_avgdl"),
        )
    )
    buckets = sorted(
        r["_b"]
        for r in qterms.select(
            F.pmod(F.xxhash64(F.col("_w")), F.lit(meta["n_buckets"]))
            .alias("_b")
        )
        .distinct()
        .collect()
    )
    probed = spark.read.parquet(_pp.join(data_root, "postings")).filter(
        F.col("bucket").isin(buckets)
    )
    # tombstoned docs (`delete_from_bm25_index`) are pruned BEFORE the
    # ranking, so a deleted doc is never retrieved AND the df folded
    # from the surviving probed rows is exact post-delete; N/avgdl
    # (the meta fold above) stay build-time until compaction — the
    # documented Lucene-before-merge stats contract. The anti-join
    # side is the tombstone set (deletes since the last compaction),
    # deliberately un-hinted so AQE broadcasts it while small.
    tombs = _bm25_tombstone_ids(spark, data_root)
    if tombs is not None:
        probed = probed.join(tombs, "doc", "left_anti")
    tf = probed.select(
        F.col("doc").alias("_doc"),
        F.col("dl").alias("_dl"),
        F.col("term").alias("_w"),
        F.col("tf").alias("_tf"),
    )
    return _bm25_rank(
        qterms, tf, stats, k, k1, b, max_df_ratio, meta["id_col"],
        allowed=allowed,
    )


def bm25_prf_search_index(
    queries: DataFrame,
    path: str,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    fb_weight: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """`bm25_prf_topk` against a persisted index built with
    ``write_bm25_index(forward=True)`` — the production PRF path, and
    value-identical to the in-session operator over the same corpus
    (both passes run the shared `_bm25_rank` tree through the shared
    `_bm25_index_probe`; feedback-term mining reads the SAME
    (doc, term, tf) rows the in-session form derives, just from the
    persisted forward layout).

    Probe cost, every stage bucket-pruned or bounded:

    - pass 1 scans the query terms' postings buckets (the
      `bm25_search_index` bound);
    - mining scans the |queries|·fb_docs feedback docs' FORWARD
      buckets (doc-hash static pruning — the whole reason the forward
      layout exists: the inverted postings cannot serve doc→terms
      without a full scan);
    - with ``max_df_ratio`` set, one more postings probe over the
      candidate terms' buckets fetches their exact df for the
      mining-time valve — the candidate vocabulary is the feedback
      docs' vocabulary, so this probe's pruning weakens as fb docs
      grow (documented, not hidden: a 5-doc feedback set over a
      64-bucket index still prunes well; valved PRF over hundreds of
      feedback docs approaches a postings scan);
    - pass 2 scans the expanded terms' buckets.

    Tombstoned docs are excluded everywhere — retrieval, mining AND
    df — through the same pruning seams as `bm25_search_index`.
    Raises if the index has no forward layout (rebuild with
    ``forward=True``; an append-only migration cannot backfill the
    forward rows for existing batches).
    """
    import posixpath as _pp

    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1: {fb_docs}")
    if fb_terms < 0:
        raise ValueError(f"fb_terms must be >= 0: {fb_terms}")
    if not 0.0 < fb_weight <= 1.0:
        raise ValueError(f"fb_weight must be in (0, 1]: {fb_weight}")
    spark = queries.sparkSession
    meta, data_root = _resolve_bm25_index(spark, path)
    if not meta["forward"]:
        raise ValueError(
            f"BM25 index at {path} has no forward layout — PRF mining "
            "needs doc→terms; rebuild with write_bm25_index("
            "forward=True)"
        )
    qterms = _bm25_query_terms(queries).localCheckpoint()
    feedback = (
        _bm25_index_probe(
            spark, data_root, meta, qterms, fb_docs, k1, b,
            max_df_ratio, allowed,
        )
        .select("query_id", F.col(meta["id_col"]).alias("_doc"))
        .localCheckpoint()
    )
    # |queries| × fb_docs ids — the bounded-driver-read pattern
    fbuckets = sorted(
        r["_b"]
        for r in feedback.select(
            F.pmod(F.xxhash64(F.col("_doc")), F.lit(meta["n_buckets"]))
            .alias("_b")
        )
        .distinct()
        .collect()
    )
    fwd = spark.read.parquet(_pp.join(data_root, "forward")).filter(
        F.col("fbucket").isin(fbuckets)
    )
    tombs = _bm25_tombstone_ids(spark, data_root)
    if tombs is not None:
        fwd = fwd.join(tombs, "doc", "left_anti")
    mined_src = feedback.join(
        fwd.select(
            F.col("doc").alias("_doc"),
            F.col("term").alias("_w"),
            F.col("tf").alias("_tf"),
        ),
        "_doc",
    )
    if max_df_ratio is not None:
        # mining-time valve with EXACT df: probe the candidate terms'
        # postings buckets (see the docstring's cost note)
        cand = mined_src.select("_w").distinct().localCheckpoint()
        cbuckets = sorted(
            r["_b"]
            for r in cand.select(
                F.pmod(
                    F.xxhash64(F.col("_w")), F.lit(meta["n_buckets"])
                ).alias("_b")
            )
            .distinct()
            .collect()
        )
        cprobe = spark.read.parquet(
            _pp.join(data_root, "postings")
        ).filter(F.col("bucket").isin(cbuckets))
        if tombs is not None:
            cprobe = cprobe.join(tombs, "doc", "left_anti")
        dfreq = (
            cprobe.select(F.col("term").alias("_w"))
            .join(cand, "_w", "left_semi")
            .groupBy("_w")
            .agg(F.count(F.lit(1)).alias("_df"))
        )
        n_total = spark.read.parquet(_pp.join(data_root, "meta")).agg(
            F.sum("n_docs").alias("_n")
        )
        mined_src = (
            mined_src.join(dfreq, "_w")
            .crossJoin(F.broadcast(n_total))
            .filter(F.col("_df") <= F.lit(max_df_ratio) * F.col("_n"))
            .drop("_df", "_n")
        )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("_fbtf").desc(), F.col("_w").asc()
    )
    mined = (
        mined_src.groupBy("query_id", "_w")
        .agg(F.sum("_tf").alias("_fbtf"))
        .withColumn("_r", F.row_number().over(wt))
        .filter(F.col("_r") <= fb_terms)
        .select(
            "query_id", "_w",
            F.lit(float(fb_weight)).cast("double").alias("_qw"),
        )
    )
    expanded = (
        qterms.withColumn("_qw", F.lit(1.0))
        .unionByName(mined)
        .groupBy("query_id", "_w")
        .agg(F.max("_qw").alias("_qw"))
        .localCheckpoint()
    )
    return _bm25_index_probe(
        spark, data_root, meta, expanded, k, k1, b, max_df_ratio,
        allowed,
    )


def _refold_bm25_index(
    spark,
    path: str,
    folded_retention: int | None,
    new_n_buckets: int | None,
    op_name: str,
) -> bool:
    """The shared fold core behind `compact_bm25_index` (new_n_buckets
    = None: keep the stored bucketing) and `resize_bm25_index`
    (re-hash every posting's term into ``new_n_buckets`` buckets):
    read every COMPLETE batch of the current version, land one
    ``batch=base`` under a NEW manifest-committed version, publish
    with the cumulative ``folded`` list. One pass over the postings
    either way — re-bucketing never needs the original corpus, because
    the postings rows carry the term."""
    import posixpath as _pp
    import uuid as _uuid

    from ..sources.fs import glob_paths, require_success_marker
    from ..sources.manifest import VersionedManifest
    from .dedup import _fold_token_list

    vm = VersionedManifest(path)
    version, payload = vm.resolve(spark)
    if payload is None:
        return False
    meta, old_root = _resolve_bm25_index(spark, path)

    def _glob_tokens(side: str, leaf: str) -> set[str]:
        return {
            p.rsplit("batch=", 1)[1].split("/", 1)[0]
            for p in glob_paths(
                spark, _pp.join(old_root, side, "batch=*", leaf)
            )
        }

    marked = _glob_tokens("postings", "_SUCCESS") & _glob_tokens(
        "meta", "_SUCCESS"
    )
    torn = sorted(
        (_glob_tokens("postings", "bucket=*/part-*") - _glob_tokens("postings", "_SUCCESS"))
        | (_glob_tokens("meta", "part-*") - _glob_tokens("meta", "_SUCCESS"))
    )
    if meta["forward"]:
        # the forward twin is a third completeness side: a token whose
        # forward fold is missing/torn must not be baked into the base
        marked &= _glob_tokens("forward", "_SUCCESS")
        torn = sorted(
            set(torn)
            | (
                _glob_tokens("forward", "fbucket=*/part-*")
                - _glob_tokens("forward", "_SUCCESS")
            )
        )
    if torn:
        raise RuntimeError(
            f"BM25 index at {path}: batch dirs {torn} hold data files "
            "without a _SUCCESS marker — a torn job commit. Restart "
            "the ingest so the same-token replay completes these "
            "folds, or remove the torn directories, then compact."
        )
    # tombstone completeness mirrors the postings rule: probes simply
    # skip a torn delete (replay heals it), but a refold that ignored
    # one would publish a base resurrecting the docs it meant to drop
    t_marked = _glob_tokens("tombstones", "_SUCCESS")
    t_torn = sorted(_glob_tokens("tombstones", "part-*") - t_marked)
    if t_torn:
        raise RuntimeError(
            f"BM25 index at {path}: tombstone batch dirs {t_torn} hold "
            "data files without a _SUCCESS marker — a torn delete "
            "commit. Re-run the same-token delete to complete it, or "
            "remove the torn directories, then compact."
        )
    complete = sorted(marked)
    if not complete:
        return False
    rel = _pp.join("versions", f"v{version + 1}-{_uuid.uuid4().hex[:8]}")
    vroot = _pp.join(path, rel)
    postings = (
        spark.read.option("basePath", _pp.join(old_root, "postings"))
        .parquet(
            *[
                _pp.join(old_root, "postings", f"batch={t}")
                for t in complete
            ]
        )
        .select("term", "doc", "dl", "tf", "bucket")
    )
    stats_correction = None
    tombs = _bm25_tombstone_ids(spark, old_root) if t_marked else None
    if tombs is not None:
        # apply deletes physically AND correct the corpus stats
        # EXACTLY: each deleted doc's dl travels on its posting rows,
        # so one distinct over the dropped rows yields the (n_docs,
        # sum_dl) to subtract — a post-refold probe is value-identical
        # to a fresh build over the survivors (the one residual is a
        # deleted doc with ZERO tokens: no posting rows, no
        # correction; it can never match a query, so only the shared
        # N/avgdl scale carries that bias until a true rebuild). The
        # new version starts with no tombstones/ dir at all.
        stats_correction = (
            postings.join(tombs, "doc", "left_semi")
            .select("doc", "dl")
            .distinct()
            .agg(
                F.count(F.lit(1)).alias("_del_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("_del_dl"),
            )
        )
        postings = postings.join(tombs, "doc", "left_anti")
    if new_n_buckets is not None:
        # the same bucket expression _bm25_postings uses, so probes of
        # the resized layout prune exactly like a fresh build's
        postings = postings.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(new_n_buckets)),
        )
    (
        postings.repartition("bucket")
        .write.mode("errorifexists")
        .partitionBy("bucket")
        .parquet(_pp.join(vroot, "postings", "batch=base"))
    )
    folded_meta = spark.read.parquet(
        *[_pp.join(old_root, "meta", f"batch={t}") for t in complete]
    ).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    )
    if stats_correction is not None:
        # broadcast 1-row × 1-row — the sanctioned tiny-side crossJoin
        folded_meta = folded_meta.crossJoin(
            F.broadcast(stats_correction)
        ).select(
            (F.col("n_docs") - F.col("_del_docs"))
            .cast("long")
            .alias("n_docs"),
            (F.col("sum_dl") - F.col("_del_dl"))
            .cast("long")
            .alias("sum_dl"),
        )
    folded_meta.write.mode("errorifexists").parquet(
        _pp.join(vroot, "meta", "batch=base")
    )
    if meta["forward"]:
        # the forward twin folds with the same tombstone anti-join;
        # on a resize its fbucket re-hashes too (forward bucketing
        # shares n_buckets, so stale fbucket values would break the
        # PRF probe's static pruning after the manifest update)
        fwd = (
            spark.read.option("basePath", _pp.join(old_root, "forward"))
            .parquet(
                *[
                    _pp.join(old_root, "forward", f"batch={t}")
                    for t in complete
                ]
            )
            .select("doc", "dl", "term", "tf", "fbucket")
        )
        if tombs is not None:
            fwd = fwd.join(tombs, "doc", "left_anti")
        if new_n_buckets is not None:
            fwd = fwd.withColumn(
                "fbucket",
                F.pmod(F.xxhash64(F.col("doc")), F.lit(new_n_buckets)),
            )
        (
            fwd.repartition("fbucket")
            .write.mode("errorifexists")
            .partitionBy("fbucket")
            .parquet(_pp.join(vroot, "forward", "batch=base"))
        )
        require_success_marker(
            spark, _pp.join(vroot, "forward", "batch=base"), op_name
        )
    require_success_marker(
        spark, _pp.join(vroot, "postings", "batch=base"), op_name
    )
    require_success_marker(
        spark, _pp.join(vroot, "meta", "batch=base"), op_name
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
    new_payload = {
        **payload,
        "current": rel,
        "folded": folded,
        "folded_deletes": folded_del,
    }
    if new_n_buckets is not None:
        new_payload["n_buckets"] = int(new_n_buckets)
    if not vm.publish(spark, new_payload, version):
        raise RuntimeError(
            f"{op_name} at {path} lost the manifest race "
            f"for version {version + 1}: a concurrent fold or rebuild "
            "committed first. Nothing is lost — the previous version "
            "remains live; re-run the compaction."
        )
    return True


def compact_bm25_index(
    spark, path: str, folded_retention: int | None = None
) -> bool:
    """Fold every COMPLETE ``batch=`` directory of the current BM25
    index version into a single ``batch=base`` under a NEW
    manifest-committed version — probe listing cost grows with batch
    dirs (one postings dir + one meta dir per fold), and this resets
    it to one. Same contract as `dedup.compact_minhash_index` /
    `similarity.compact_ivf_index`:

    - completeness per token = ``_SUCCESS`` on BOTH sides (postings +
      meta); a side holding data files without the marker is a torn
      commit and the compaction REFUSES loudly;
    - side missing/empty = the designed append crash window — skipped,
      the same-token replay re-folds it whole;
    - the published payload's cumulative ``folded`` list makes
      `append_bm25_index` no-op for compacted-away tokens (the
      replay-after-compaction duplication window), pruned by
      ``folded_retention``;
    - losing the manifest race to a concurrent fold raises — the old
      version stays live, re-run picks up the new batch.

    The meta side folds to ONE row (n_docs/sum_dl sum additively), so
    probe stats cost stays O(1) regardless of fold history.

    Tombstones (`delete_from_bm25_index`) are APPLIED here: the folded
    postings anti-join the complete tombstone batches, N/sum_dl are
    corrected exactly from the dropped rows' ``(doc, dl)``, tombstone
    tokens join ``folded_deletes`` (so delete replays no-op — a list
    disjoint from the append tokens' ``folded``), and the new version
    starts tombstone-free — a post-compaction probe is value-identical
    to a fresh build over the surviving corpus. Torn tombstone commits
    refuse exactly like torn postings folds.
    """
    return _refold_bm25_index(
        spark, path, folded_retention, None, "BM25 index compaction"
    )


def resize_bm25_index(
    spark, path: str, n_buckets: int, folded_retention: int | None = None
) -> bool:
    """Rebuild the index's bucket layout under ``n_buckets`` WITHOUT
    the original corpus — the action `maintain_bm25_index`'s
    ``hot_buckets_flagged`` exists to trigger: postings rows carry the
    term, so re-bucketing is one re-hash pass over the postings (read
    once, write once), never a corpus re-tokenize — at 100 TB that is
    the difference between an overnight layout job and re-running the
    whole ingest. Scores are untouched (bucketing is pure layout; df /
    tf / N / avgdl never change), so probes rank identically before
    and after — pinned in TestResizeBm25Index. One exception: pending
    tombstones are applied by the shared refold core (a resize is also
    a compaction), so with deletes outstanding the post-resize scores
    are the post-compaction ones — corrected stats over the surviving
    corpus, not the pre-delete ranking.

    Also compacts as a side effect (the refold lands one
    ``batch=base``), inherits the full compaction contract
    (torn-commit refusal, folded-token durability, manifest race), and
    updates the manifest's ``n_buckets`` so later appends and probes
    hash consistently.

    When resizing helps — and when it can't: bucket heat from MANY
    distinct terms colliding into one hash bucket spreads under more
    buckets; heat from ONE stopword-grade term does not (a term's
    postings are indivisible by design — that is what makes probe df
    exact), and the answer there is the probe-side ``max_df_ratio``
    valve. `bm25_index_stats`'s ``max_term_in_max_bucket`` vs
    ``max_bucket`` tells the two apart — the HOTTEST bucket's own
    largest term, never the global term max, which may live in a
    cooler bucket and would misread collision heat as a hot term;
    `maintain_bm25_index` applies exactly that rule (at most once per
    target) before resizing.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    return _refold_bm25_index(
        spark, path, folded_retention, n_buckets, "BM25 index resize"
    )


def bm25_index_stats(spark, path: str) -> DataFrame:
    """One-row operational health summary of a persisted BM25 index —
    the lexical sibling of `dedup.minhash_index_stats`: ``(n_docs,
    n_batches, max_bucket, p95_bucket, mean_bucket,
    max_term_in_max_bucket, max_term_postings, n_tombstones)`` where
    bucket occupancy counts POSTINGS per term-hash bucket (surviving
    AND tombstoned — heat is physical until compaction applies the
    deletes), ``n_tombstones`` counts pending deletes
    (`delete_from_bm25_index` — note ``n_docs`` is the build-time
    meta fold, which tombstones cannot see into until compaction),
    ``max_term_in_max_bucket`` is the largest single TERM's posting
    count inside the HOTTEST bucket, and ``max_term_postings`` is the
    global single-term max (context only).

    What an operator reads off it at 100 TB: ``max_bucket`` far above
    ``mean_bucket`` means hot buckets; ``max_term_in_max_bucket`` vs
    ``max_bucket`` tells WHY — the hottest bucket dominated by one
    stopword-grade term is indivisible by design (the probe-side
    ``max_df_ratio`` valve is the answer), while a hot bucket of many
    smaller terms is hash collisions (`resize_bm25_index` to more
    buckets spreads them). The in-bucket number — not the global term
    max, which may live in a cooler bucket — is what the diagnosis
    must use. ``n_batches`` is the `compact_bm25_index` watermark,
    exactly as on the MinHash/IVF sides.
    """
    import posixpath as _pp

    _, data_root = _resolve_bm25_index(spark, path)
    postings = spark.read.parquet(_pp.join(data_root, "postings"))
    occupancy = postings.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    bucket_stats = occupancy.agg(
        F.max("_n").alias("max_bucket"),
        F.expr("approx_percentile(_n, 0.95)").alias("p95_bucket"),
        F.round(F.avg("_n"), 3).alias("mean_bucket"),
    )
    # per-(bucket, term) counts feed BOTH term maxima in one pass: the
    # global max AND the max within each bucket — max_by picks the
    # hottest bucket's single-term peak, which is the number the
    # hot_term-vs-collisions diagnosis actually needs (the GLOBAL max
    # term may live in a different, cooler bucket, and comparing it
    # against the hottest bucket would misdiagnose collision heat as
    # hot_term and skip the resize that would fix it)
    per_bucket_term = postings.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).alias("_n")
    )
    term_stats = per_bucket_term.groupBy("bucket").agg(
        F.sum("_n").alias("_bn"), F.max("_n").alias("_bt")
    ).agg(
        F.max(F.struct(F.col("_bn"), F.col("_bt")))["_bt"].alias(
            "max_term_in_max_bucket"
        )
    )
    global_term = per_bucket_term.groupBy("term").agg(
        F.sum("_n").alias("_n")
    ).agg(F.max("_n").alias("max_term_postings"))
    totals_meta = spark.read.parquet(_pp.join(data_root, "meta")).agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    n_batches = postings.agg(
        F.countDistinct("batch").alias("n_batches")
    )
    # delete debt: tombstoned docs still pay probe-side anti-joins and
    # postings bytes until the next compaction applies them — the
    # `maintain_bm25_index` watermark reads this column
    # DISTINCT docs: a worklist replayed under fresh tokens re-writes
    # the same ids, and raw row counts would inflate the debt
    # watermark into no-op full-rewrite compactions
    tombs = _bm25_tombstone_ids(spark, data_root)
    n_tombstones = (
        tombs.agg(F.countDistinct("doc").alias("n_tombstones"))
        if tombs is not None
        else spark.range(1).select(
            F.lit(0).cast("long").alias("n_tombstones")
        )
    )
    return (
        totals_meta.crossJoin(n_batches)
        .crossJoin(bucket_stats)
        .crossJoin(term_stats)
        .crossJoin(global_term)
        .crossJoin(n_tombstones)
    )


def maintain_bm25_index(
    spark,
    path: str,
    max_batches: int = 8,
    max_bucket_ratio: float = 8.0,
    folded_retention: int | None = None,
    vacuum: bool = False,
    resize_on_hot: int | None = None,
    max_tombstone_ratio: float = 0.2,
) -> dict:
    """The scheduled maintenance job over `bm25_index_stats` — same
    policy shape as `similarity.maintain_ivf_index` /
    `dedup.maintain_minhash_index`: compact past the ``max_batches``
    fold-fragmentation watermark (manifest race reported
    success-shaped, torn-commit refusal propagates), flag
    ``hot_buckets_flagged`` when the largest bucket exceeds
    ``max_bucket_ratio`` × the mean, and optionally vacuum superseded
    versions after a successful compaction/resize.

    ``resize_on_hot`` makes the hot flag ACTIONABLE: when set and the
    flag fires, the job diagnoses the heat via
    ``max_term_in_max_bucket`` (`bm25_index_stats`'s rule — the
    hottest bucket's OWN largest term, never the global term max,
    which may live in a cooler bucket) and

    - ``hot_cause='collisions'`` (the hottest bucket is many smaller
      terms): runs `resize_bm25_index` to ``resize_on_hot`` buckets —
      one postings re-hash pass, no corpus re-tokenize;
    - ``hot_cause='hot_term'`` (one term holds > half the hottest
      bucket): SKIPS the resize — a term's postings are indivisible,
      so more buckets cannot spread them; the report says so and the
      documented answer is the probe-side ``max_df_ratio`` valve.

    The resize fires at most ONCE per target: when the index already
    has ``>= resize_on_hot`` buckets the job reports
    ``resize_skipped='already_at_target'`` instead of refolding the
    whole postings layout into an identical bucket count every tick
    (residual heat at the target size is hash luck or hot terms —
    re-running the same resize cannot fix either; raise the target or
    apply the valve). Default None keeps the r9 observe-only
    behavior. A resize implies a compaction, so the fragmentation
    branch is skipped in the same tick when the resize fired.

    ``max_tombstone_ratio`` is the delete-debt watermark (the IVF
    side's twin): when pending tombstones exceed that fraction of
    ``n_docs``, the compaction fires even below the fragmentation
    watermark — until deletes are applied physically every probe pays
    the tombstone anti-join and the deleted docs' postings bytes, and
    N/avgdl carry the deleted mass (the Lucene
    deleted-docs-before-merge cost, with compaction as the merge)."""
    meta, _root = _resolve_bm25_index(spark, path)
    row = bm25_index_stats(spark, path).collect()[0]
    hot = bool(
        row["mean_bucket"]
        and row["max_bucket"] > max_bucket_ratio * row["mean_bucket"]
    )
    report = {
        "n_docs": row["n_docs"],
        "n_batches": row["n_batches"],
        "max_bucket": row["max_bucket"],
        "p95_bucket": row["p95_bucket"],
        "mean_bucket": row["mean_bucket"],
        "max_term_in_max_bucket": row["max_term_in_max_bucket"],
        "max_term_postings": row["max_term_postings"],
        "n_tombstones": row["n_tombstones"],
        "n_buckets": meta["n_buckets"],
        "compacted": False,
        "compaction_race_lost": False,
        "hot_buckets_flagged": hot,
        "hot_cause": None,
        "resized": False,
    }
    if hot:
        one_term_heat = (
            row["max_term_in_max_bucket"] is not None
            and row["max_term_in_max_bucket"] * 2 > row["max_bucket"]
        )
        report["hot_cause"] = "hot_term" if one_term_heat else "collisions"
    if (
        resize_on_hot is not None
        and report["hot_cause"] == "collisions"
    ):
        if meta["n_buckets"] >= resize_on_hot:
            report["resize_skipped"] = "already_at_target"
        else:
            try:
                report["resized"] = resize_bm25_index(
                    spark, path, resize_on_hot,
                    folded_retention=folded_retention,
                )
            except RuntimeError as exc:
                if "lost the manifest race" not in str(exc):
                    raise
                report["compaction_race_lost"] = True
            if vacuum and report["resized"]:
                report["vacuumed"] = vacuum_bm25_index(spark, path)
    tombstone_debt = bool(
        row["n_docs"]
        and row["n_tombstones"] > max_tombstone_ratio * row["n_docs"]
    )
    if (
        row["n_batches"] > max_batches or tombstone_debt
    ) and not report["resized"]:
        try:
            report["compacted"] = compact_bm25_index(
                spark, path, folded_retention=folded_retention
            )
        except RuntimeError as exc:
            if "lost the manifest race" not in str(exc):
                raise
            report["compaction_race_lost"] = True
        if vacuum and report["compacted"]:
            report["vacuumed"] = vacuum_bm25_index(spark, path)
    return report


def _poly_hash(col: Column, dim: int) -> Column:
    """Exact polynomial rolling hash of a string → bucket id in
    ``[0, dim)``: fold ``h = (h·31 + codepoint) mod dim`` over the
    characters. Integer arithmetic only — replayable bit-exactly by
    any SQL engine with a list fold (DuckDB ``list_reduce``), unlike
    xxhash64/murmur3 whose cross-engine absence is why the r4
    candidate-set queries are rows-only."""
    codes = F.transform(
        F.filter(F.split(col, ""), lambda c: c != F.lit("")),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(int(dim)).cast("long"),
    )


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    max_ngram: int = 2,
) -> DataFrame:
    """fastText-style hashed bag-of-n-grams features: ``(id, fid, x)``
    — word 1..``max_ngram``-grams bucketed by the exact `_poly_hash`
    into ``dim`` bins, ``x`` = term frequency normalized by the doc's
    gram count (int/int → exact double). Map-side explode + one
    (id, fid) count aggregate; docs with no words emit no rows (their
    logit is the bias, handled by the scoring join)."""
    if max_ngram not in (1, 2):
        raise ValueError("max_ngram must be 1 or 2")
    w = F.filter(words(F.col(text_col)), lambda t: t != F.lit(""))
    grams = w
    if max_ngram == 2:
        # guard: sequence(0, -1) would DESCEND — sub-2-word docs get
        # an explicitly empty bigram array instead
        bigrams = F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(w, bigrams)
    g = (
        docs.select(F.col(id_col).alias("id"), grams.alias("gs"))
        .filter(F.size("gs") > 0)
        .select(
            "id",
            F.size("gs").alias("ng"),
            F.explode("gs").alias("gram"),
        )
        .select("id", "ng", _poly_hash(F.col("gram"), dim).alias("fid"))
    )
    return g.groupBy("id", "fid").agg(
        (F.count(F.lit(1)) / F.first("ng")).alias("x")
    )


def train_hashed_ngram_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    max_ngram: int = 2,
    n_epochs: int = 5,
    lr: float = 1.0,
    l2: float = 0.0,
) -> tuple[DataFrame, float]:
    """The fastText-style sibling of `train_quality_classifier`
    (DCLM/FineWeb-Edu train their filter on hashed n-gram features,
    not summary stats): full-batch logistic regression over
    `hashed_ngram_features`, weights kept DISTRIBUTED as a
    ``(fid, weight)`` DataFrame — at fastText's 2M-bucket scale the
    weight vector never lands on the driver; only the bias (one
    float) does. Returns ``(weights_df, bias)`` for
    `hashed_ngram_logit`.

    Per epoch: one broadcast join of the (≤ dim)-row weights onto the
    feature rows + a doc-keyed logit aggregate, one fid-keyed
    gradient aggregate, one outer-join weight update,
    ``localCheckpoint`` to cut the iterative lineage (the
    duplicate_clusters pattern). The bias gradient is the epoch's one
    1-row collect."""
    feats = hashed_ngram_features(
        docs, text_col, id_col, dim=dim, max_ngram=max_ngram
    ).persist()
    ys = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("double").alias("y"),
    ).persist()
    n = ys.count()
    if n == 0:
        feats.unpersist()
        ys.unpersist()
        raise ValueError("train_hashed_ngram_classifier: empty input")
    spark = docs.sparkSession
    w_df = spark.createDataFrame([], "fid long, weight double")
    bias = 0.0
    try:
        for _ in range(int(n_epochs)):
            scored = (
                feats.join(F.broadcast(w_df), "fid", "left")
                .groupBy("id")
                .agg(
                    F.sum(
                        F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0))
                    ).alias("dot")
                )
                .join(ys, "id", "right")
                .select(
                    "id",
                    (
                        F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(
                                -(
                                    F.lit(bias)
                                    + F.coalesce(
                                        F.col("dot"), F.lit(0.0)
                                    )
                                )
                            )
                        )
                        - F.col("y")
                    ).alias("err"),
                )
            )
            # scored feeds BOTH per-epoch consumers (the fid-keyed
            # gradient aggregate and the bias gradient) and is
            # recomputed for each. Two "optimizations" were tried and
            # measured at sf0.1 (r13): folding the bias gradient into
            # the weight checkpoint as a sentinel row, and persisting
            # scored across the two consumers — all three forms land
            # within the same-session scatter band (~25–32 s across
            # windows, no form reliably faster: the scoring join is
            # cheap enough that cache/union plumbing costs what the
            # recompute costs). Kept the simplest form; the epoch
            # count, not this constant, is the lever that matters.
            grads = (
                feats.join(scored, "id")
                .groupBy("fid")
                .agg(F.sum(F.col("x") * F.col("err")).alias("g"))
            )
            gb = scored.agg(F.sum("err").alias("gb")).first()["gb"]
            w_df = (
                w_df.join(grads, "fid", "full")
                .select(
                    "fid",
                    (
                        F.coalesce(F.col("weight"), F.lit(0.0))
                        - F.lit(lr)
                        * (
                            F.coalesce(F.col("g"), F.lit(0.0)) / F.lit(n)
                            + F.lit(l2)
                            * F.coalesce(F.col("weight"), F.lit(0.0))
                        )
                    ).alias("weight"),
                )
                .localCheckpoint()
            )
            bias = bias - lr * (gb / n)
    finally:
        feats.unpersist()
        ys.unpersist()
    return w_df, bias


def hashed_ngram_logit(
    docs: DataFrame,
    weights: DataFrame,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    max_ngram: int = 2,
) -> DataFrame:
    """Score docs under a `train_hashed_ngram_classifier` model:
    ``(id, score, keep)`` — the same broadcast-weights join + doc
    aggregate as the training pass; docs with no grams score the
    bias. Score rounded to 6 dp, keep from the rounded score (the
    quality_logit contract)."""
    feats = hashed_ngram_features(
        docs, text_col, id_col, dim=dim, max_ngram=max_ngram
    )
    dots = (
        feats.join(F.broadcast(weights), "fid", "left")
        .groupBy("id")
        .agg(
            F.sum(
                F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0))
            ).alias("dot")
        )
    )
    score = F.round(
        F.lit(bias) + F.coalesce(F.col("dot"), F.lit(0.0)), 6
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(dots, "id", "left")
        .select(
            "id",
            score.alias("score"),
            (score > 0).cast("int").alias("keep"),
        )
    )


def _viterbi_segment(
    word: str, logp: dict, max_piece_len: int, unk_logp: float
) -> list:
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ logp(piece); ties prefer FEWER pieces, then (per DP position,
    right to left) the LONGER final piece (deterministic — the
    pure-Python test reference implements the same order). Characters
    absent from the vocabulary segment as single-char unknowns at
    ``unk_logp``."""
    n = len(word)
    NEG = float("-inf")
    # best[i] = (score, n_pieces, start_of_last_piece) for word[:i]
    best = [(NEG, 0, -1)] * (n + 1)
    best[0] = (0.0, 0, -1)
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_piece_len), i):
            if best[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = unk_logp
                else:
                    continue
            sc = (best[j][0] + lp, -(best[j][1] + 1), j)
            # maximize (score, -n_pieces, start j) — a smaller j is a
            # LONGER last piece, preferred on full ties
            if cand is None or (sc[0], sc[1], -sc[2]) > (
                cand[0], cand[1], -cand[2]
            ):
                cand = sc
        if cand is not None:
            best[i] = (cand[0], -cand[1], cand[2])
    if best[n][0] == NEG:
        return list(word)  # unreachable: single-char unk always legal
    out = []
    i = n
    while i > 0:
        j = best[i][2]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def train_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 256,
    seed_size: int = 1024,
    n_iters: int = 2,
    max_piece_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distinct_words: int = 2_000_000,
) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo ACL 2018 — the
    SentencePiece algorithm, the other public tokenizer family beside
    BPE), hard-EM form: seed the vocabulary with the corpus's most
    frequent substrings (≤ ``max_piece_len`` chars, counted per
    occurrence × word frequency, plus EVERY single character —
    coverage by construction), then alternate (E) Viterbi-segment
    every distinct word under current piece log-probs and (M)
    re-estimate ``logprob = ln(count/total)`` from the segmentation
    counts, pruning the lowest-count multi-char pieces down to
    ``vocab_size`` after each M step. Hard-EM (Viterbi counts, not
    forward-backward expectations) is the documented simplification —
    the common public reimplementation shape; the pure-Python test
    reference implements the identical procedure.

    Distribution shape: substring seeding and count aggregation are
    explode → hash-aggregate over DISTINCT words (weighted by word
    frequency — corpus size only enters through the word-count
    aggregate); the E step is an Arrow-batched ``mapInPandas`` over
    distinct words with the (bounded, ≤ seed_size + alphabet) vocab
    broadcast by closure; per-iteration counts collect ≤ |vocab| rows
    to the driver (the train_bpe_merges bounded-collect pattern).
    ``max_distinct_words`` guards the word table like
    ``max_vocab_rows`` guards BPE training. Returns ``(piece,
    logprob)``."""
    import math

    if vocab_size < 1 or seed_size < vocab_size:
        raise ValueError(
            f"need seed_size ≥ vocab_size ≥ 1, got "
            f"{seed_size} / {vocab_size}"
        )
    words_df = (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).persist()
    n_words = words_df.count()
    if n_words == 0:
        words_df.unpersist()
        raise ValueError("train_unigram_lm: no words in the corpus")
    if n_words > max_distinct_words:
        words_df.unpersist()
        raise ValueError(
            f"{n_words} distinct words > max_distinct_words="
            f"{max_distinct_words} — raise the cap deliberately"
        )
    # substring seeding: every (start, len ≤ max_piece_len) substring
    # of every distinct word, weight = freq per occurrence
    subs = words_df.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_piece_len)),
                                F.length("w") - i + 1,
                            ),
                        ),
                        lambda l: F.substring(F.col("w"), i, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(
        F.sum("freq").alias("c")
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(int(seed_size))
    )
    seed = {
        r["piece"]: r["c"]
        for r in chars.unionByName(multi).collect()
    }
    total = sum(seed.values())
    logp = {p: math.log(c / total) for p, c in seed.items()}
    unk_logp = math.log(1e-12)
    mpl = int(max_piece_len)

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    seg_schema = StructType([
        StructField("pieces", ArrayType(StringType()), False),
        StructField("freq", LongType(), False),
    ])

    n_single = sum(1 for p in logp if len(p) == 1)
    for _ in range(int(n_iters)):
        cur = dict(logp)

        def _estep(pdf_iter, _cur=cur):
            import pandas as pd

            for pdf in pdf_iter:
                rows = []
                for w, fr in zip(pdf["w"], pdf["freq"]):
                    rows.append(
                        (_viterbi_segment(w, _cur, mpl, unk_logp), int(fr))
                    )
                yield pd.DataFrame(
                    {
                        "pieces": [r[0] for r in rows],
                        "freq": [r[1] for r in rows],
                    }
                )

        seg_counts = {
            r["piece"]: r["c"]
            for r in (
                words_df.mapInPandas(_estep, schema=seg_schema)
                .select(
                    F.explode("pieces").alias("piece"), "freq"
                )
                .groupBy("piece")
                .agg(F.sum("freq").alias("c"))
                .collect()
            )
        }
        # M step over surviving pieces; single chars never die (else
        # coverage breaks), unused ones keep a floor count of 1
        new_counts = {}
        for p in cur:
            c = seg_counts.get(p, 0)
            if len(p) == 1:
                new_counts[p] = max(c, 1)
            elif c > 0:
                new_counts[p] = c
        # prune lowest-count multi-char pieces down to vocab_size
        multis = sorted(
            (p for p in new_counts if len(p) > 1),
            key=lambda p: (-new_counts[p], p),
        )
        budget = max(int(vocab_size) - n_single, 0)
        for p in multis[budget:]:
            del new_counts[p]
        tot = sum(new_counts.values())
        logp = {p: math.log(c / tot) for p, c in new_counts.items()}
    words_df.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        sorted(logp.items()), "piece string, logprob double"
    )


def unigram_segment(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab_rows: int = 1_000_000,
) -> DataFrame:
    """Segment a corpus under a `train_unigram_lm` vocabulary →
    ``(id, pieces array<string>, n_pieces)`` — Viterbi per word (the
    training E step's exact rule, same tie-breaks), Arrow-batched
    with per-batch word memoization (the `bpe_encode` arrow-tier
    shape). The vocab collect is guarded (`max_vocab_rows`); unknown
    characters segment as single-char pieces."""
    import math

    rows = vocab.select("piece", "logprob").limit(
        int(max_vocab_rows) + 1
    ).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"vocab exceeds max_vocab_rows={max_vocab_rows}"
        )
    if not rows:
        raise ValueError("empty unigram vocab")
    logp = {r["piece"]: r["logprob"] for r in rows}
    mpl = max(len(p) for p in logp)
    unk_logp = math.log(1e-12)

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    id_type = docs.schema[id_col].dataType
    out_schema = StructType([
        StructField("id", id_type, False),
        StructField("pieces", ArrayType(StringType()), False),
        StructField("n_pieces", IntegerType(), False),
    ])
    src = docs.select(
        F.col(id_col).alias("id"),
        F.filter(
            words(F.coalesce(F.col(text_col), F.lit(""))),
            lambda t: t != F.lit(""),
        ).alias("ws"),
    )

    def _seg(pdf_iter):
        import pandas as pd

        memo: dict = {}
        for pdf in pdf_iter:
            ids, pieces, ns = [], [], []
            for i, ws in zip(pdf["id"], pdf["ws"]):
                out = []
                for w in ws:
                    got = memo.get(w)
                    if got is None:
                        got = _viterbi_segment(w, logp, mpl, unk_logp)
                        memo[w] = got
                    out.extend(got)
                ids.append(i)
                pieces.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {"id": ids, "pieces": pieces, "n_pieces": ns}
            )

    return src.mapInPandas(_seg, schema=out_schema)
