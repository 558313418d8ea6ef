"""Structured-Streaming ingest: file source → watermarked dedup →
sink, processed with availableNow (bounded test of the unbounded plan)."""

from __future__ import annotations

import os

from entity_resolution__spark.data.synth import make_transcripts
from entity_resolution__spark.schema import TRANSCRIPTS
from entity_resolution__spark.streaming.ingest import (
    deduped_turns,
    read_transcript_stream,
)


def test_stream_dedup_turns(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = make_transcripts(seed=42, n_entities=10)
    # duplicate every turn once: stream must drop the duplicates
    dup = __import__("pandas").concat([pdf, pdf], ignore_index=True)
    sdf = spark.createDataFrame(dup, schema=TRANSCRIPTS)
    sdf.coalesce(2).write.mode("overwrite").parquet(src)

    stream = read_transcript_stream(spark, src)
    assert stream.isStreaming
    out = deduped_turns(stream)

    q = (
        out.writeStream.format("memory")
        .queryName("turns_dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n from turns_dedup_test").collect()[0]["n"]
    assert got == len(pdf)  # exactly one row per (conv_id, turn_idx)
