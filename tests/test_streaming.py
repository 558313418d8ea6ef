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


def test_stream_signature_dedup_docs(spark, tmp_path):
    """Streaming MinHash-signature dedup: exact duplicates AND
    token-permuted duplicates (same token set → same signature) are
    dropped inside the watermark; distinct docs survive."""
    import datetime as dt

    import pandas as pd

    from entity_resolution__spark.streaming.ingest import (
        signature_deduped_docs,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", t0),
        (1, "the quick brown fox jumps over the lazy dog", t0),  # exact dup
        (2, "lazy dog the over jumps fox brown quick the", t0),  # permuted dup
        (3, "completely different content about spark engines", t0),
    ]
    src = str(tmp_path / "docs_src")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sdf = spark.createDataFrame(pdf, schema="doc_id long, text string, ts timestamp")
    sdf.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string, ts timestamp")
        .load(src)
    )
    out = signature_deduped_docs(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sig_dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sig"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select doc_id from sig_dedup_test").collect()
    kept = sorted(r["doc_id"] for r in got)
    assert len(kept) == 2
    assert 3 in kept and kept[0] in (0, 1, 2)


def test_conversation_progress_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): one summary
    row per conversation after a single availableNow batch — correct
    turn counts, role counts, first/last event times, done=false (the
    timeout leg needs wall-clock idle time; its state-removal contract
    is covered by the operator's hasTimedOut branch)."""
    import datetime as dt
    import os as _os

    import pandas as pd

    from entity_resolution__spark.schema import TRANSCRIPTS
    from entity_resolution__spark.streaming.ingest import (
        conversation_progress,
        read_transcript_stream,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "hello", None, t0),
        ("c1", 1, "assistant", "hi", None, t0 + dt.timedelta(seconds=30)),
        ("c1", 2, "user", "bye", None, t0 + dt.timedelta(seconds=90)),
        ("c2", 0, "user", "solo turn", None, t0 + dt.timedelta(minutes=5)),
    ]
    src = str(tmp_path / "src")
    _os.makedirs(src)
    spark.createDataFrame(rows, TRANSCRIPTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    out = conversation_progress(read_transcript_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("conv_progress_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["conv_id"]: r
        for r in spark.sql("select * from conv_progress_test").collect()
    }
    assert set(got) == {"c1", "c2"}
    assert got["c1"]["n_turns"] == 3 and got["c1"]["n_roles"] == 2
    assert got["c2"]["n_turns"] == 1 and got["c2"]["n_roles"] == 1
    assert not got["c1"]["done"] and not got["c2"]["done"]
    assert got["c1"]["first_ts"] == t0
    assert got["c1"]["last_ts"] == t0 + dt.timedelta(seconds=90)
    assert got["c2"]["first_ts"] == got["c2"]["last_ts"]
