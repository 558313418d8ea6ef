"""Text-analysis operators for a large-scale training-data pipeline.

All pure Catalyst expressions (whole-stage codegen, DuckDB-oracle
expressible): language ID (stopword-hit heuristic), quality scoring,
token counting, and document fingerprinting over a (doc_id, text) table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists (public common-word lists) for the
# n-gram/stopword-hit language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "las"],
}

TOKEN_PATTERN = r"[a-z0-9]+"
# BPE-ish word/number/punct splitter for token counting
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_count(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + single punct."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = tokens_col(text)
    out = []
    for lang, words in LANG_MARKERS.items():
        hits = F.size(
            F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))
        )
        out.append((lang, hits))
    return out


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; ties broken by declaration order
    (en, de, fr, es); 'und' when no marker hits. Chained CASE — exactly
    reproducible in the DuckDB oracle SQL."""
    scores = lang_scores(text)
    best = F.greatest(*[h for _, h in scores])
    expr = F.when(best == 0, F.lit("und"))
    for lang, hits in scores:
        expr = expr.when(hits == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals per doc."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks)
    stop_en = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_en, t)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    chars = F.length(text)
    return df.select(
        "*",
        chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        F.round(chars.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias(
            "q_chars_per_token"
        ),
        F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias(
            "q_stopword_ratio"
        ),
        F.round(n_punct.cast("double") / F.greatest(chars, F.lit(1)), 6).alias(
            "q_punct_ratio"
        ),
    )


def acronyms_col(text: Column) -> Column:
    """Acronym detection — the reference's exact find_acronyms rule
    (visualize_k_value_for_blocking.py:33-43): find [A-Z0-9&-]{2,} runs
    (no word anchors — findall on the raw text), strip non-alphanumerics,
    keep only cleaned forms with length ≥2 that still contain an
    uppercase letter (isupper() on a digits-only string is False), then
    lowercase and dedupe. Pure Catalyst."""
    cleaned = F.transform(
        F.regexp_extract_all(text, F.lit(r"[A-Z0-9&\-]{2,}"), 0),
        lambda a: F.regexp_replace(a, r"[^A-Za-z0-9]", ""),
    )
    kept = F.filter(
        cleaned,
        lambda c: (F.length(c) >= 2) & c.rlike("[A-Z]"),
    )
    return F.array_distinct(F.transform(kept, lambda c: F.lower(c)))


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    join (rolling-hash analog, portable to the DuckDB oracle)."""
    return F.md5(F.array_join(tokens_col(text), " "))


def group_quantiles(
    df: "DataFrame",
    value_col: str,
    group_col: str,
    probs: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> "DataFrame":
    """EXACT per-group quantiles of a numeric column → (group, p, q).

    Type-1 (lower) empirical quantile: q(p) = the value at rank
    ceil(p·n) (1-based, ties broken by value only — rank position is
    irrelevant once sorted). Exact and integer-clean, so the result is
    bit-identical on any engine — unlike `approx_percentile`
    (t-digest, merge-order-dependent) this is the corpus-QA form: "the
    p99 document length" must mean the same number when the oracle,
    the dashboard, and the pipeline each recompute it.

    Scale shape: ONE window sort per group (row_number + count over the
    group) and a broadcast of the tiny probs dim — no collect, no
    second pass. The sort is the unavoidable cost of exactness; at
    100 TB run it on the already-lang-partitioned staged table so the
    window needs no extra exchange. Skew note: a single giant group
    serializes its sort — that is inherent to exact rank (the escape
    hatch is approx_percentile when exactness is negotiable).
    """
    from pyspark.sql.window import Window

    ranked = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("val")
    ).select(
        "grp",
        "val",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.col("val").asc())
        ).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    spark = df.sparkSession
    pdim = spark.createDataFrame([(float(p),) for p in probs], "p double")
    return (
        ranked.join(
            F.broadcast(pdim),
            F.col("rn") == F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("n"))),
        )
        .select(
            F.col("grp").alias(group_col),
            "p",
            F.col("val").alias("q"),
        )
    )


def bm25_rank(
    df: "DataFrame",
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Okapi BM25 top-k retrieval over the corpus → (id, score6, rank):
    the IR scoring a training-data engine needs for query-based corpus
    slicing / relevance filtering (reference has tf-idf features only,
    models/pairwise_classifier.py — no ranked retrieval).

      idf(t)    = ln(1 + (N − df + 0.5)/(df + 0.5))
      score(d)  = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))

    Deterministic ranking: scores are rounded to 6 BEFORE the top-k
    (same rule as ivf/knn — raw-float ordering could flip on ulp noise
    across engines), ties broken by ascending id.

    Scale shape: per-doc work is proportional to QUERY-TERM HITS, not
    document length — the token list is filtered to the (tiny, literal)
    query vocabulary before the explode, so the (doc, term) tf table
    carries only matches. df/N/avgdl are one K-row aggregate each; the
    final top-k is orderBy+limit = distributed TakeOrdered, never a
    global unpartitioned sort. No UDFs anywhere."""
    import re

    from pyspark.sql.window import Window

    # same tokenizer as tokens_col: lowercase [a-z0-9]+ runs
    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    if not terms or k <= 0:
        raise ValueError(f"bm25_rank: empty query or bad k={k}")
    qlit = F.array(*[F.lit(t) for t in terms])
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("l")
    )
    # one pass for the corpus constants (N, avgdl) — a 1-row collect
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("l")).alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"] or 0.0)
    tf = (
        toks.select(
            "id",
            F.size("l").alias("dl"),
            F.explode(
                F.filter("l", lambda x: F.array_contains(qlit, x))
            ).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .groupBy("id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (k1 + 1.0) / denom), 6
            ).alias("score6")
        )
    )
    top = scored.orderBy(F.col("score6").desc(), F.col("id").asc()).limit(k)
    w = Window.partitionBy().orderBy(F.col("score6").desc(), F.col("id").asc())
    return top.select(
        F.col("id").alias(id_col), "score6", F.row_number().over(w).alias("rank")
    )


def unigram_logprob(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Per-document unigram negative log-likelihood under the corpus's
    own unigram LM: nll = −(1/n)·Σ_t ln(count(t)/T) over positional
    tokens — the cheap engine-native analog of CCNet's LM-perplexity
    quality signal (docs whose tokens are corpus-typical score low;
    gibberish and vocabulary outliers score high). Complements the
    rule-based quality_gate with a distributional signal.

    Scale shape: tokens aggregate to per-(doc, token) tf FIRST, so the
    token-keyed join against the count table carries doc-distinct
    tokens, not the raw stream; the Zipf head ("the") is exactly the
    key AQE's skew-join splits. T is one 1-row aggregate. Empty docs
    yield nll 0.0."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("l")
    )
    tf = (
        toks.select("id", F.explode("l").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    cc = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    # T rides as a broadcast 1-row column instead of a driver collect:
    # the old mid-plan collect forced a second full tokenization pass
    # (and the toks-based n_tokens branch below a third) — the tf
    # shuffle is now computed once and REUSED by the cc/total branches.
    # Σ_t c(t) over the count table equals Σ_d |d| exactly (integral
    # doubles), so log(c/T) is bit-identical to the literal form.
    tot = cc.agg(F.sum("c").alias("_T"))
    per = (
        tf.join(cc, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("id")
        .agg(
            F.sum(F.col("tf") * F.log(F.col("c") / F.col("_T"))).alias("lp"),
            F.sum("tf").alias("n"),
        )
    )
    # n_tokens = Σ tf per doc — already in `per`; docs absent from `per`
    # are exactly the zero-token docs (coalesce to 0/0.0), so the old
    # size(l) branch (a third tokenization) is redundant
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n"), F.lit(0.0)).cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(-F.col("lp") / F.col("n"), F.lit(0.0)), 6
            ).alias("nll6"),
        )
    )
