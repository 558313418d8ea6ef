"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Pure functions of (seed, n_entities): conversations come in duplicate
families — `entity` is the latent true cluster, variants are
near-duplicate copies produced by token drop/swap/case/accent
perturbations calibrated so same-family pairs have token-Jaccard ≳ 0.5
and cross-family pairs < 0.2. Rows are emitted SHUFFLED so tests prove
turn ordering is recovered by the window over turn_idx, not input order
(per-turn text equality invariant, BASELINE.json.input_hint).

No wall-clock, no external data: timestamps derive from entity/turn ids.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

# Country names mirroring the reference's whitelist
# (/root/reference/src/constraints/geo_constraints.py:6-11) — used by the
# geo-analog constraint tests. Public knowledge (country names).
COUNTRIES = [
    "United States", "Germany", "Japan", "Canada", "France",
    "Italy", "Spain", "China", "India", "Brazil",
    "Australia", "Netherlands", "Sweden", "Switzerland", "Norway",
    "Denmark", "Finland", "Austria", "Belgium", "Poland",
]

# Wide vocabulary (spec: cross-family token-Jaccard < 0.2): entity core
# tokens are drawn from 1200 synthetic words so unrelated conversations
# share few content tokens, like real discriminative text.
_SYLL = (
    "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu "
    "ma me mi mo mu na ne ni no nu ra re ri ro ru sa se si so su "
    "ta te ti to tu va ve vi vo vu za ze zi zo zu"
).split()
_VOCAB = [
    _SYLL[(i * 7) % len(_SYLL)]
    + _SYLL[(i * 13 + 3) % len(_SYLL)]
    + _SYLL[(i * 29 + 11) % len(_SYLL)]
    + str(i % 10)
    for i in range(1200)
]

_ORG_STEMS = (
    "acme nova orion vertex zenith quantum stellar apex cobalt ember "
    "harbor iris krypton lumen meridian nimbus onyx pylon quartz rivet "
    "sable tundra umbra vortex willow xenon yonder zephyr atlas boreal"
).split()

_ACCENTS = {"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ü", "c": "ç", "n": "ñ"}

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "calc", "db", None]

_BASE_TS = datetime(2026, 1, 1)


def _entity_profile(rng: np.random.Generator, entity: int) -> dict:
    """Stable per-entity content: org-like name, country, core tokens."""
    org = (
        _ORG_STEMS[int(rng.integers(len(_ORG_STEMS)))]
        + "-"
        + _ORG_STEMS[int(rng.integers(len(_ORG_STEMS)))]
        + str(entity)
    )
    country = COUNTRIES[int(rng.integers(len(COUNTRIES)))]
    core = list(rng.choice(_VOCAB, size=10, replace=False))
    n_turns = int(rng.integers(2, 13))
    tools = [_TOOLS[int(rng.integers(len(_TOOLS)))] for _ in range(n_turns)]
    return {
        "org": org,
        "country": country,
        "core": core,
        "n_turns": n_turns,
        "tools": tools,
    }


def _turn_text(profile: dict, turn: int, rng: np.random.Generator) -> list[str]:
    """Token list for one turn of the pristine (variant-0) conversation."""
    toks = [profile["org"], profile["core"][turn % len(profile["core"])]]
    toks += list(rng.choice(profile["core"], size=4, replace=True))
    if turn == 0:
        toks.append(profile["country"])
    if turn == 1 and rng.random() < 0.3:
        toks.append("U.S.A.")  # dotted acronym path (geo_constraints.py:30-46)
    return toks


def _perturb(tokens: list[str], rng: np.random.Generator) -> list[str]:
    """Near-duplicate perturbation: drop/replace/swap/case/accent,
    calibrated to same-family token-Jaccard ≳ 0.5."""
    out = list(tokens)
    # drop up to two tokens
    for _ in range(2):
        if len(out) > 3 and rng.random() < 0.5:
            out.pop(int(rng.integers(len(out))))
    # replace one token with a fresh vocab word (introduces new tokens)
    if out and rng.random() < 0.4:
        i = int(rng.integers(len(out)))
        out[i] = _VOCAB[int(rng.integers(len(_VOCAB)))]
    # swap two adjacent tokens
    if len(out) > 2 and rng.random() < 0.5:
        i = int(rng.integers(len(out) - 1))
        out[i], out[i + 1] = out[i + 1], out[i]
    # case flip one token
    if rng.random() < 0.5:
        i = int(rng.integers(len(out)))
        out[i] = out[i].upper()
    # accent-insert into one token (tests NFKD strip path)
    if rng.random() < 0.4:
        i = int(rng.integers(len(out)))
        out[i] = "".join(_ACCENTS.get(ch, ch) for ch in out[i])
    return out


def make_transcripts(
    seed: int = 42, n_entities: int = 40, skew: bool = False
) -> pd.DataFrame:
    """Generate the transcripts table. Deterministic in (seed, n_entities, skew).

    Returns one row per turn with columns (conv_id, turn_idx, role, text,
    tool, ts), rows shuffled.
    """
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    hot_turn = "the quarterly sales report for region north shows growth"
    for entity in range(n_entities):
        erng = np.random.default_rng(seed * 1_000_003 + entity)
        profile = _entity_profile(erng, entity)
        # Zipf-ish family size 1..6
        n_variants = 1 + min(5, int(erng.zipf(1.8)) - 1)
        pristine = [
            _turn_text(profile, t, erng) for t in range(profile["n_turns"])
        ]
        for variant in range(n_variants):
            conv_id = f"c{entity:05d}-{variant:02d}"
            vrng = np.random.default_rng(seed * 7_000_003 + entity * 101 + variant)
            for t in range(profile["n_turns"]):
                toks = (
                    list(pristine[t]) if variant == 0 else _perturb(pristine[t], vrng)
                )
                text = " ".join(toks)
                if skew and entity % 20 == 0 and t == 0:
                    # hot blocking key: ~5% share a near-identical first turn
                    text = hot_turn + " " + text
                role = _ROLES[(t + (vrng.integers(3) if variant else 0)) % 3]
                tool = profile["tools"][t]
                ts = _BASE_TS + timedelta(hours=entity, seconds=30 * t)
                rows.append((conv_id, t, role, text, tool, ts))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # shuffle rows: ordering must be recovered by the window, not input order
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def true_clusters(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Latent truth: conv_id → entity family (from the id encoding)."""
    ids = transcripts["conv_id"].drop_duplicates().sort_values()
    ent = ids.str.slice(1, 6).astype(int)
    return pd.DataFrame({"conv_id": ids.values, "entity": ent.values})


def make_labeled_pairs(
    transcripts: pd.DataFrame, seed: int = 42, neg_per_pos: int = 3
) -> pd.DataFrame:
    """Ground-truth labeled pairs (analog of affiliationstrings_mapping.csv).

    Positives: all within-family pairs. Negatives: sampled cross-family
    pairs. block_key is the first normalized token of the conversation
    (same key family the pipeline blocks on), so the F1 gate can restrict
    to pairs sharing a blocking key (BASELINE.json.metric).
    """
    truth = true_clusters(transcripts)
    by_ent = truth.groupby("entity")["conv_id"].apply(list)
    rng = np.random.default_rng(seed + 9)
    pos: list[tuple] = []
    for members in by_ent:
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pos.append((members[i], members[j], 1))
    all_ids = sorted(truth["conv_id"])
    ent_of = dict(zip(truth["conv_id"], truth["entity"]))
    neg: list[tuple] = []
    target = len(pos) * neg_per_pos
    while len(neg) < target:
        a, b = rng.choice(all_ids, size=2, replace=False)
        if ent_of[a] != ent_of[b]:
            a, b = (a, b) if a < b else (b, a)
            neg.append((a, b, 0))
    df = pd.DataFrame(
        pos + neg, columns=["conv_id_a", "conv_id_b", "label"]
    ).drop_duplicates(["conv_id_a", "conv_id_b"])
    df["label"] = df["label"].astype("int32")
    return df.reset_index(drop=True)


def make_chain_edges(
    spark,
    n_chains: int = 10_000,
    chain_len: int = 100,
    n_long: int = 50,
    long_len: int = 1_000,
):
    """Synthetic edge list for at-size connected-components runs: many
    short chains plus a few LONG chains (long paths maximize star-loop
    rounds — the loop halves path diameters per iteration, so expected
    rounds ≈ log2(long_len)). Node ids are zero-padded strings so
    lexicographic order equals numeric order and the expected root of
    every chain is its first node. Returns (edges(src, dst), n_edges,
    expected(node, root)) — all DataFrames built with spark.range, no
    driver-side materialization.
    """
    from pyspark.sql import functions as F

    stride = chain_len + 1

    def chain(base: int, count: int, length: int):
        s = length + 1
        ids = spark.range(count * s)
        nodes = ids.select(
            (F.lit(base) + F.col("id")).alias("nid"),
            (F.lit(base) + (F.col("id") / s).cast("long") * s).alias("rid"),
            (F.col("id") % s).alias("j"),
        )
        fmt = lambda c: F.format_string("n%012d", c)  # noqa: E731
        edges = nodes.filter(F.col("j") < length).select(
            fmt(F.col("nid")).alias("src"), fmt(F.col("nid") + 1).alias("dst")
        )
        expected = nodes.select(
            fmt(F.col("nid")).alias("node"), fmt(F.col("rid")).alias("root")
        )
        return edges, expected

    e1, x1 = chain(0, n_chains, chain_len)
    e2, x2 = chain(n_chains * stride, n_long, long_len)
    return (
        e1.unionByName(e2),
        n_chains * chain_len + n_long * long_len,
        x1.unionByName(x2),
    )
