"""Pairwise feature assembly (the reference's 8-feature kernel).

Reference feature frame: edit_ratio, jaro_winkler, lcs_ratio,
token_jaccard, token_cosine, tfidf_word_cosine, tfidf_char_cosine,
dmetaphone_match (/root/reference/src/features/feautre_extraction.py:
104-113,151-163). Split by execution tier:

  Catalyst (codegen, no Python):  token_jaccard (+ threshold filters)
  Arrow pandas UDF (one struct):  edit_ratio, jaro_winkler, lcs_ratio,
                                  dmetaphone_match, token_cosine,
                                  tfidf_word_cosine, tfidf_char_cosine,
                                  role_seq_sim, tool_seq_sim

Design deviation (documented, SURVEY.md §7 hard parts): the reference
fits TF-IDF on each candidate-pair batch (feautre_extraction.py:89-98),
making feature values depend on batch composition. We fit IDF GLOBALLY
once per run (a small token→idf table broadcast into the UDF), so
features are partition-invariant and deterministic under any shuffle.
Char 3-5-gram cosine uses hashed sublinear TF without IDF (vocabulary-
free at scale).

role_seq_sim / tool_seq_sim extend the family to transcripts
(north_star: "tool/role sequence features"): normalized indel similarity
over the per-turn role/tool sequences encoded as unit-separator strings.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from entity_resolution__spark.functions import strings as K

FEATURE_COLS = [
    "edit_ratio",
    "jaro_winkler",
    "lcs_ratio",
    "token_jaccard",
    "token_cosine",
    "tfidf_word_cosine",
    "tfidf_char_cosine",
    "dmetaphone_match",
    "role_seq_sim",
    "tool_seq_sim",
]

_STRUCT_FIELDS = [c for c in FEATURE_COLS if c != "token_jaccard"]
_UDF_RETURN = T.StructType(
    [T.StructField(c, T.DoubleType()) for c in _STRUCT_FIELDS]
)


def _counter_cosine(ca: Counter, cb: Counter) -> float:
    """Multiset cosine with the reference's zero-norm convention
    (feautre_extraction.py:63-75: den==0 → 1.0)."""
    if not ca and not cb:
        return 1.0
    dot = sum(v * cb.get(k, 0) for k, v in ca.items())
    na = np.sqrt(sum(v * v for v in ca.values()))
    nb = np.sqrt(sum(v * v for v in cb.values()))
    den = na * nb
    return 1.0 if den == 0 else float(dot / den)


def _tfidf_cosine(ta: list[str], tb: list[str], idf: dict[str, float]) -> float:
    """Sublinear-TF IDF cosine with a GLOBAL idf map (unseen token idf=1)."""
    ca, cb = Counter(ta), Counter(tb)
    if not ca and not cb:
        return 1.0
    wa = {k: (1.0 + np.log(v)) * idf.get(k, 1.0) for k, v in ca.items()}
    wb = {k: (1.0 + np.log(v)) * idf.get(k, 1.0) for k, v in cb.items()}
    dot = sum(v * wb.get(k, 0.0) for k, v in wa.items())
    na = np.sqrt(sum(v * v for v in wa.values()))
    nb = np.sqrt(sum(v * v for v in wb.values()))
    den = na * nb
    return 1.0 if den == 0 else float(dot / den)


def _char_ngrams(s: str, lo: int = 3, hi: int = 5) -> Counter:
    c: Counter = Counter()
    for n in range(lo, hi + 1):
        for i in range(max(0, len(s) - n + 1)):
            c[s[i : i + n]] += 1
    return c


# Character-level kernels (LCS/edit/JW) are O(n·m) per pair: cap input
# length so per-pair cost is bounded at any scale. Shared constant with
# the pandas oracle (same truncation both sides → parity holds). The
# reference computes over full strings, but its entities are ~60-char
# affiliation strings; conversations are unbounded, so a cap is the
# scale-correct semantics here.
MAX_KERNEL_CHARS = 512


def compute_feature_struct(
    norm_l: pd.Series,
    norm_r: pd.Series,
    tokens_l: pd.Series,
    tokens_r: pd.Series,
    roles_l: pd.Series,
    roles_r: pd.Series,
    tools_l: pd.Series,
    tools_r: pd.Series,
    idf: dict[str, float] | None = None,
) -> pd.DataFrame:
    """Batch kernel shared by the Spark UDF and the test oracle."""
    idf = idf or {}
    norm_l = norm_l.fillna("").str.slice(0, MAX_KERNEL_CHARS)
    norm_r = norm_r.fillna("").str.slice(0, MAX_KERNEL_CHARS)
    n = len(norm_l)
    out = {c: np.empty(n, dtype=np.float64) for c in _STRUCT_FIELDS}
    out["edit_ratio"] = K.edit_ratio_series(norm_l, norm_r).to_numpy()
    out["jaro_winkler"] = K.jaro_winkler_series(norm_l, norm_r).to_numpy()
    out["lcs_ratio"] = K.lcs_ratio_series(norm_l, norm_r).to_numpy()
    out["dmetaphone_match"] = K.metaphone_match_series(norm_l, norm_r).to_numpy()

    tl = tokens_l.to_numpy()
    tr = tokens_r.to_numpy()
    tc = np.empty(n)
    twc = np.empty(n)
    chc = np.empty(n)
    nl = norm_l.fillna("").to_numpy()
    nr = norm_r.fillna("").to_numpy()
    for i in range(n):
        a = list(tl[i]) if tl[i] is not None else []
        b = list(tr[i]) if tr[i] is not None else []
        tc[i] = _counter_cosine(Counter(a), Counter(b))
        twc[i] = _tfidf_cosine(a, b, idf)
        chc[i] = _counter_cosine(_char_ngrams(nl[i]), _char_ngrams(nr[i]))
    out["token_cosine"] = tc
    out["tfidf_word_cosine"] = twc
    out["tfidf_char_cosine"] = chc

    def seq_sim(sl: pd.Series, sr: pd.Series) -> np.ndarray:
        ja = sl.map(lambda x: "\x1f".join(x) if x is not None else "")
        jb = sr.map(lambda x: "\x1f".join(x) if x is not None else "")
        # indel ratio over the joined sequence treats each element char-wise;
        # sequences are short (≤ dozens of turns) so this is cheap and
        # order-sensitive, which is the point (tool/role ORDER matters).
        return K.edit_ratio_series(ja, jb).to_numpy()

    out["role_seq_sim"] = seq_sim(roles_l, roles_r)
    out["tool_seq_sim"] = seq_sim(tools_l, tools_r)
    return pd.DataFrame(out)


def make_feature_udf(idf_map: dict[str, float] | None = None):
    idf = dict(idf_map or {})

    @pandas_udf(_UDF_RETURN)
    def feature_struct(
        norm_l: pd.Series,
        norm_r: pd.Series,
        tokens_l: pd.Series,
        tokens_r: pd.Series,
        roles_l: pd.Series,
        roles_r: pd.Series,
        tools_l: pd.Series,
        tools_r: pd.Series,
    ) -> pd.DataFrame:
        return compute_feature_struct(
            norm_l, norm_r, tokens_l, tokens_r, roles_l, roles_r, tools_l, tools_r, idf
        )

    return feature_struct


def global_idf(
    conv: DataFrame, max_vocab: int = 1 << 20, n_docs: int | None = None
) -> dict[str, float]:
    """token → smoothed idf over all conversations, capped to the top
    `max_vocab` terms by document frequency (rare tail defaults to idf=1
    inside the UDF — at 10^12-turn scale the broadcast stays bounded).
    Smoothing matches sklearn's TfidfVectorizer: ln((1+N)/(1+df)) + 1.
    """
    if n_docs is None:
        n_docs = conv.count()
    rows = (
        conv.select(F.explode("token_set").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc())
        .limit(max_vocab)
        .collect()
    )
    return {
        r["token"]: float(np.log((1.0 + n_docs) / (1.0 + r["df"])) + 1.0) for r in rows
    }


def token_jaccard_col(tokens_l: Column, tokens_r: Column) -> Column:
    from entity_resolution__spark.functions.normalize import jaccard

    return jaccard(tokens_l, tokens_r)
