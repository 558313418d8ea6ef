"""The graft invariant: per-turn text equality under STABLE turn
ordering — input rows are shuffled, the window/sort must recover order
(BASELINE.json.input_hint)."""

from __future__ import annotations

from entity_resolution__spark.operators.canonicalize import canonicalize
from tests.oracle import canonicalize_pd


def test_turn_order_recovered(spark, tiny_transcripts, tiny_transcripts_sdf):
    conv = canonicalize(tiny_transcripts_sdf)
    got = {
        r["conv_id"]: (r["turn_texts"], r["roles"], r["n_turns"])
        for r in conv.collect()
    }
    t = tiny_transcripts.sort_values(["conv_id", "turn_idx"])
    for conv_id, g in t.groupby("conv_id"):
        texts, roles, n = got[conv_id]
        assert texts == list(g["text"])  # per-turn text equality, in order
        assert roles == list(g["role"])
        assert n == len(g)


def test_full_text_matches_oracle(spark, tiny_transcripts, tiny_transcripts_sdf):
    conv = canonicalize(tiny_transcripts_sdf)
    got = {r["conv_id"]: (r["full_text"], r["tokens"]) for r in conv.collect()}
    oracle = canonicalize_pd(tiny_transcripts)
    for _, r in oracle.iterrows():
        ft, toks = got[r["conv_id"]]
        assert ft == r["full_text"]
        assert toks == r["tokens"]
