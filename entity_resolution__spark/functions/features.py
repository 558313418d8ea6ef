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

Vectorized execution (round-3 rewrite of the round-2 per-row loop):
the three cosine features are sparse dot products over per-STRING
count vectors. A pair batch references far fewer distinct strings than
2×rows (each conversation appears in many candidate pairs), so the
kernel factorizes the batch's strings once (pd.factorize), builds each
unique string's token-count and char-ngram-count vectors once (numpy
unique/sliding-window — no Python dicts), and per pair does only sorted
intersections + dots. Token lists are DERIVED from norm_text inside the
kernel (normalization is idempotent, so findall(norm_text) ==
tokenize(full_text)); the pair shuffle therefore ships neither `tokens`
nor duplicate token material — only norm_text + the token_set needed by
the Catalyst jaccard gate.

role_seq_sim / tool_seq_sim extend the family to transcripts
(north_star: "tool/role sequence features"): normalized indel similarity
over the per-turn role/tool sequences encoded as unit-separator-joined
strings (joined once per conversation in the conversations stage, not
once per pair).
"""

from __future__ import annotations

import re

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

# same token definition as functions.normalize (reference
# common_methods.py:7-18); applied to ALREADY-normalized text
_TOKEN_RE = re.compile(r"[a-z0-9]+")

# Character-level kernels (LCS/edit/JW) are O(n·m) per pair: cap input
# length so per-pair cost is bounded at any scale. Shared constant with
# the pandas oracle (same truncation both sides → parity holds). The
# reference computes over full strings, but its entities are ~60-char
# affiliation strings; conversations are unbounded, so a cap is the
# scale-correct semantics here. Char n-grams use the same cap; token
# vectors use the FULL string (tokens are cheap per unit length).
MAX_KERNEL_CHARS = 512

_EMPTY_U64 = np.empty(0, dtype=np.uint64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)
_EMPTY_TOK = np.empty(0, dtype=object)


def _token_profile(s: str, idf: dict[str, float]):
    """One string → (sorted unique tokens, count weights, tfidf weights,
    |count|, |tfidf|). Sublinear TF (1+ln tf) × global idf (unseen
    token idf=1), matching the round-2 Counter kernel exactly."""
    toks = _TOKEN_RE.findall(s)
    if not toks:
        return (_EMPTY_TOK, _EMPTY_F64, _EMPTY_F64, 0.0, 0.0)
    keys, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    w_tc = cnt.astype(np.float64)
    w_tf = 1.0 + np.log(w_tc)
    if idf:
        w_tf = w_tf * np.fromiter(
            (idf.get(t, 1.0) for t in keys), dtype=np.float64, count=len(keys)
        )
    return (
        keys,
        w_tc,
        w_tf,
        float(np.sqrt((w_tc * w_tc).sum())),
        float(np.sqrt((w_tf * w_tf).sum())),
    )


def _ngram_profile(s: str):
    """One string → (sorted unique char 3-5-gram keys, counts, norm).

    n-grams are packed into uint64 keys instead of substrings: each
    codepoint is folded to 12 bits ((cp ^ cp>>12) & 0xFFF — identity for
    codepoints < 4096, i.e. all Latin/Greek/Cyrillic after NFKD), five
    12-bit digits + a length tag in bits 60-62. Exact (collision-free)
    for <4096 codepoints; beyond that it is a deterministic hash, shared
    with the pandas oracle so parity holds regardless."""
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    if len(cps) < 3:
        return (_EMPTY_U64, _EMPTY_F64, 0.0)
    folded = ((cps ^ (cps >> np.uint32(12))) & np.uint32(0xFFF)).astype(np.uint64)
    parts = []
    for n in (3, 4, 5):
        if len(folded) >= n:
            w = np.lib.stride_tricks.sliding_window_view(folded, n)
            key = w[:, 0].copy()
            for j in range(1, n):
                key = key * np.uint64(4096) + w[:, j]
            key |= np.uint64(n) << np.uint64(60)
            parts.append(key)
    keys, cnt = np.unique(np.concatenate(parts), return_counts=True)
    wt = cnt.astype(np.float64)
    return (keys, wt, float(np.sqrt((wt * wt).sum())))


def _sparse_dot(ka, wa, kb, wb) -> float:
    """Dot product of two sorted-unique sparse vectors."""
    _, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    if len(ia) == 0:
        return 0.0
    return float((wa[ia] * wb[ib]).sum())


def compute_feature_struct(
    norm_l: pd.Series,
    norm_r: pd.Series,
    roles_l: pd.Series,
    roles_r: pd.Series,
    tools_l: pd.Series,
    tools_r: pd.Series,
    idf: dict[str, float] | None = None,
) -> pd.DataFrame:
    """Batch kernel shared by the Spark UDF and the test oracle.

    norm_l/r: normalized full text. roles/tools: unit-separator-joined
    per-turn sequences (strings, one per conversation).
    Zero-norm convention follows the reference (feautre_extraction.py:
    63-75): cosine denominator 0 → 1.0.
    """
    idf = idf or {}
    full_l = norm_l.fillna("")
    full_r = norm_r.fillna("")
    tl = full_l.str.slice(0, MAX_KERNEL_CHARS)
    tr = full_r.str.slice(0, MAX_KERNEL_CHARS)
    n = len(full_l)
    out = {}
    out["edit_ratio"] = K.edit_ratio_series(tl, tr).to_numpy()
    out["jaro_winkler"] = K.jaro_winkler_series(tl, tr).to_numpy()
    out["lcs_ratio"] = K.lcs_ratio_series(tl, tr).to_numpy()
    out["dmetaphone_match"] = K.metaphone_match_series(tl, tr).to_numpy()

    # factorize the batch's strings: profiles built once per DISTINCT
    # string, pairs reference them by code
    codes, uniques = pd.factorize(
        pd.concat([full_l, full_r], ignore_index=True), sort=False
    )
    tok_prof = [_token_profile(s, idf) for s in uniques]
    ng_prof = [_ngram_profile(s[:MAX_KERNEL_CHARS]) for s in uniques]
    il, ir = codes[:n], codes[n:]

    tc = np.empty(n)
    twc = np.empty(n)
    chc = np.empty(n)
    for i in range(n):
        ka, wca, wfa, nca, nfa = tok_prof[il[i]]
        kb, wcb, wfb, ncb, nfb = tok_prof[ir[i]]
        if nca == 0.0 or ncb == 0.0:
            tc[i] = 1.0
            twc[i] = 1.0
        else:
            _, ia, ib = np.intersect1d(
                ka, kb, assume_unique=True, return_indices=True
            )
            tc[i] = float((wca[ia] * wcb[ib]).sum()) / (nca * ncb)
            twc[i] = float((wfa[ia] * wfb[ib]).sum()) / (nfa * nfb)
        ga, wga, na = ng_prof[il[i]]
        gb, wgb, nb = ng_prof[ir[i]]
        den = na * nb
        chc[i] = 1.0 if den == 0.0 else _sparse_dot(ga, wga, gb, wgb) / den
    out["token_cosine"] = tc
    out["tfidf_word_cosine"] = twc
    out["tfidf_char_cosine"] = chc

    # indel ratio over the joined sequence treats each element char-wise;
    # sequences are short (≤ dozens of turns) so this is cheap and
    # order-sensitive, which is the point (tool/role ORDER matters)
    out["role_seq_sim"] = K.edit_ratio_series(
        roles_l.fillna(""), roles_r.fillna("")
    ).to_numpy()
    out["tool_seq_sim"] = K.edit_ratio_series(
        tools_l.fillna(""), tools_r.fillna("")
    ).to_numpy()
    return pd.DataFrame(out)


def make_feature_udf(idf_map: dict[str, float] | None = None):
    idf = dict(idf_map or {})

    @pandas_udf(_UDF_RETURN)
    def feature_struct(
        norm_l: pd.Series,
        norm_r: pd.Series,
        roles_l: pd.Series,
        roles_r: pd.Series,
        tools_l: pd.Series,
        tools_r: pd.Series,
    ) -> pd.DataFrame:
        return compute_feature_struct(
            norm_l, norm_r, roles_l, roles_r, tools_l, tools_r, idf
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
