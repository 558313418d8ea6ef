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

Vectorized execution (round-3 rewrite of the round-2 per-row loop;
round 4 made the remaining per-pair work C-resident): the three cosine
features are sparse dot products over per-STRING count vectors. A pair
batch references far fewer distinct strings than 2×rows (each
conversation appears in many candidate pairs), so the kernel factorizes
the batch's strings once (pd.factorize), builds each unique string's
token-count and char-ngram-count vectors once (numpy unique/
sliding-window — no Python dicts), maps token keys to order-preserving
int codes once per batch, and per pair does one searchsorted pass per
intersection (a fully-batched lexsort alternative was measured 8-19×
SLOWER — see the rejected-design note at _coded_token_keys). The char
kernels share one LCS pass between edit_ratio and lcs_ratio
(strings.indel_and_lcs_series). Token lists are
DERIVED from norm_text inside the
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
    token idf=1), matching the round-2 Counter kernel exactly.

    Kept as the reference per-string form (tests); the batch kernel
    applies idf through a per-batch vocabulary gather instead
    (_apply_idf_weights) — same values, no per-key dict lookups."""
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


def _count_profile(s: str):
    """One string → (sorted unique tokens, count weights, |count|) —
    the idf-free part of _token_profile."""
    toks = _TOKEN_RE.findall(s)
    if not toks:
        return (_EMPTY_TOK, _EMPTY_F64, 0.0)
    keys, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    w_tc = cnt.astype(np.float64)
    return (keys, w_tc, float(np.sqrt((w_tc * w_tc).sum())))


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
    # incremental key build: k4 extends k3, k5 extends k4 (one multiply-
    # add per extra n instead of rebuilding each window from scratch)
    B = np.uint64(4096)
    tag = np.uint64(1) << np.uint64(60)
    parts = []
    k = folded[:-2] * B * B + folded[1:-1] * B + folded[2:]  # untagged 3-grams
    parts.append(k | (np.uint64(3) * tag))
    if len(folded) >= 4:
        k = k[:-1] * B + folded[3:]
        parts.append(k | (np.uint64(4) * tag))
        if len(folded) >= 5:
            k = k[:-1] * B + folded[4:]
            parts.append(k | (np.uint64(5) * tag))
    keys, cnt = np.unique(np.concatenate(parts), return_counts=True)
    wt = cnt.astype(np.float64)
    return (keys, wt, float(np.sqrt((wt * wt).sum())))


def _sparse_dot(ka, wa, kb, wb) -> float:
    """Dot product of two sorted-unique sparse vectors (reference form —
    kept for tests; the batch path uses _searchsorted_dot)."""
    _, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    if len(ia) == 0:
        return 0.0
    return float((wa[ia] * wb[ib]).sum())


def _flatten_profiles(profiles: list, key_ix: int, weight_ixs: tuple[int, ...]):
    """list of per-unique-string profiles → (flat_keys, [flat_weights…],
    offsets) — the concatenated form the batch code-mapping consumes."""
    keys = [p[key_ix] for p in profiles]
    lens = np.fromiter((len(k) for k in keys), dtype=np.int64, count=len(keys))
    offs = np.zeros(len(keys) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat_k = np.concatenate(keys) if keys else np.empty(0, dtype=object)
    flat_w = [
        np.concatenate([p[ix] for p in profiles]) if profiles else _EMPTY_F64
        for ix in weight_ixs
    ]
    return flat_k, flat_w, offs


# A NOTE ON THE REJECTED DESIGN (round 4): the obvious "eliminate the
# per-pair loop" rewrite — gather both sides' profile entries tagged by
# pair index, lexsort by (pair, key), multiply adjacent equal keys,
# bincount per pair — was implemented and benchmarked: 18.8 s vs 0.8 s
# (char n-grams) and 5.8 s vs 0.5 s (tokens) against the per-pair loop
# on a 40k-pair batch of ~370-char texts. A global argsort over the
# ~100M gathered entries is out-of-cache O(T log T); the per-pair loop
# does the same total element work in L2-resident slices. The loop
# stays, with its per-pair numpy work made cheap: token keys are mapped
# once per batch to ORDER-PRESERVING int codes (hash factorize + a rank
# permutation of the small vocabulary — object-dtype comparisons never
# run per pair), and the intersection is one binary-search pass of the
# b-side into the a-side (searchsorted) instead of intersect1d's
# sort-of-the-concatenation. Accumulation stays in ascending key order
# per pair, so values are batch-composition-invariant.


def _coded_token_keys(tok_prof: list):
    """Per-profile token-key arrays remapped to int64 codes whose order
    equals the token string order (sorted-unique in, sorted-unique out).
    Also returns the batch vocabulary in code order, so per-batch
    weights (idf) become one array gather instead of per-key dict gets.
    """
    flat_tok, _, offs = _flatten_profiles(tok_prof, 0, ())
    if not len(flat_tok):
        return [np.empty(0, dtype=np.int64) for _ in tok_prof], []
    c0, vocab = pd.factorize(flat_tok, sort=False)
    order = np.argsort(vocab, kind="stable")
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[order] = np.arange(len(vocab))
    return np.split(rank[c0], offs[1:-1]), np.asarray(vocab, dtype=object)[order]


def _searchsorted_match(ka: np.ndarray, kb: np.ndarray):
    """Match positions of two sorted-unique int key arrays:
    (positions into ka, positions into kb), ascending key order."""
    if ka.size == 0 or kb.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    idx = np.searchsorted(ka, kb)
    safe = np.minimum(idx, ka.size - 1)
    eq_b = np.flatnonzero((idx < ka.size) & (ka[safe] == kb))
    return idx[eq_b], eq_b


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
    er, lr = K.indel_and_lcs_series(tl, tr)  # one LCS pass for both
    out["edit_ratio"] = er.to_numpy()
    out["lcs_ratio"] = lr.to_numpy()
    out["jaro_winkler"] = K.jaro_winkler_series(tl, tr).to_numpy()
    out["dmetaphone_match"] = K.metaphone_match_series(tl, tr).to_numpy()

    # factorize the batch's strings: profiles built once per DISTINCT
    # string, pairs reference them by code
    codes, uniques = pd.factorize(
        pd.concat([full_l, full_r], ignore_index=True), sort=False
    )
    tok_prof = [_count_profile(s) for s in uniques]
    ng_prof = [_ngram_profile(s[:MAX_KERNEL_CHARS]) for s in uniques]
    il, ir = codes[:n], codes[n:]

    # per-pair loop over C-speed primitives: int-coded token keys (one
    # batch-level factorize; no object comparisons per pair) + one
    # searchsorted pass per intersection (see the rejected-design note
    # above for why there is no global sort here)
    tok_keys, vocab_sorted = _coded_token_keys(tok_prof)
    # tfidf weights via one vocabulary gather (same values and float
    # order as _token_profile's per-key idf.get form)
    idf_arr = None
    if idf and len(vocab_sorted):
        idf_arr = np.fromiter(
            (idf.get(t, 1.0) for t in vocab_sorted),
            dtype=np.float64,
            count=len(vocab_sorted),
        )
    wf_prof = []
    for p, (_, wc, _norm) in enumerate(tok_prof):
        if not len(wc):
            wf_prof.append((_EMPTY_F64, 0.0))
            continue
        wf = 1.0 + np.log(wc)
        if idf_arr is not None:
            wf = wf * idf_arr[tok_keys[p]]
        wf_prof.append((wf, float(np.sqrt((wf * wf).sum()))))
    tc = np.empty(n)
    twc = np.empty(n)
    chc = np.empty(n)
    for i in range(n):
        a, b = il[i], ir[i]
        _, wca, nca = tok_prof[a]
        _, wcb, ncb = tok_prof[b]
        if nca == 0.0 or ncb == 0.0:
            tc[i] = 1.0
            twc[i] = 1.0
        else:
            wfa, nfa = wf_prof[a]
            wfb, nfb = wf_prof[b]
            ia, ib = _searchsorted_match(tok_keys[a], tok_keys[b])
            tc[i] = float((wca[ia] * wcb[ib]).sum()) / (nca * ncb)
            twc[i] = float((wfa[ia] * wfb[ib]).sum()) / (nfa * nfb)
        ga, wga, na = ng_prof[a]
        gb, wgb, nb = ng_prof[b]
        den = na * nb
        if den == 0.0:
            chc[i] = 1.0
        else:
            ja, jb = _searchsorted_match(ga, gb)
            chc[i] = float((wga[ja] * wgb[jb]).sum()) / den
    out["token_cosine"] = tc
    out["tfidf_word_cosine"] = twc
    out["tfidf_char_cosine"] = chc

    # indel ratio over the joined sequence treats each element char-wise;
    # sequences are short (≤ dozens of turns) so this is cheap and
    # order-sensitive, which is the point (tool/role ORDER matters).
    # Role/tool vocabularies are tiny, so the same (l, r) sequence combo
    # recurs across many pairs (measured 9× for tool seqs at bench
    # scale): compute once per distinct combo and scatter back.
    er_kernel = K.edit_ratio_kernel()  # C path when rapidfuzz probe passed
    out["role_seq_sim"] = _dedup_pair_kernel(
        er_kernel, roles_l.fillna(""), roles_r.fillna("")
    )
    out["tool_seq_sim"] = _dedup_pair_kernel(
        er_kernel, tools_l.fillna(""), tools_r.fillna("")
    )
    return pd.DataFrame(out)


def _dedup_pair_kernel(fn, a: pd.Series, b: pd.Series) -> np.ndarray:
    """fn(a[i], b[i]) evaluated once per DISTINCT (a, b) combination."""
    codes, combos = pd.factorize(
        pd.Series(zip(a.to_numpy(), b.to_numpy())), sort=False
    )
    vals = np.fromiter(
        (fn(x, y) for x, y in combos), dtype=np.float64, count=len(combos)
    )
    return vals[codes]


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
