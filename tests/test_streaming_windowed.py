"""Watermarked streaming windowed aggregation (streaming/windowed.py):
append-mode finalization and late-data dropping, driven micro-batch by
micro-batch through the file source (maxFilesPerTrigger=1 + mtime-ordered
files makes batch order deterministic)."""

from __future__ import annotations

import json
import os
import time
import uuid

from delta_kernel_rs_spark.streaming.windowed import windowed_event_counts


def _write_batch(d, name, rows, mtime):
    path = os.path.join(d, name)
    with open(path, "w") as fh:
        for ts, uid, val in rows:
            fh.write(json.dumps({"ts": ts, "user_id": uid, "value": val}) + "\n")
    os.utime(path, (mtime, mtime))
    return path


def test_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    base = time.mktime((2024, 3, 1, 10, 0, 0, 0, 0, -1))  # local 10:00

    def iso(hour, minute):
        return f"2024-03-01 {hour:02d}:{minute:02d}:00"

    # batch 1: three on-time events in the 10:00 window
    _write_batch(
        src,
        "b1.json",
        [(iso(10, 5), 1, 2.5), (iso(10, 20), 2, 1.0), (iso(10, 40), 1, 0.5)],
        base + 1,
    )

    sdf = spark.readStream.schema(
        "ts TIMESTAMP, user_id LONG, value DOUBLE"
    ).json(src)
    out = windowed_event_counts(
        sdf, "ts", window="1 hour", watermark="30 minutes", value_col="value"
    )
    sink = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark → 10:10
        # batch 2: an event at 12:00 — watermark advances to 11:30, past
        # the 10:00 window's end, so that window finalizes and emits
        _write_batch(src, "b2.json", [(iso(12, 0), 3, 9.0)], base + 2)
        q.processAllAvailable()
        # batch 3: a LATE event for the already-closed 10:00 window —
        # must be dropped, not re-opened and not double-emitted
        _write_batch(src, "b3.json", [(iso(10, 30), 9, 100.0)], base + 3)
        q.processAllAvailable()
        q.processAllAvailable()  # one extra cycle to flush finalization
    finally:
        q.stop()

    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    emitted = {
        (r.window_start, r.n_events, r.sum_value) for r in rows
    }
    # exactly ONE finalized window: 10:00 with the 3 on-time events
    # (sum 4.0) — the late 100.0 event was dropped; the 12:00 window
    # never finalized (watermark never passed its end), so it is absent
    assert len(emitted) == 1
    ((ws, n, sv),) = emitted
    assert n == 3 and sv == 4.0
    import datetime

    assert datetime.datetime.fromtimestamp(ws) == datetime.datetime(
        2024, 3, 1, 10, 0
    )
