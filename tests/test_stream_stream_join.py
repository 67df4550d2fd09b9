"""Stream-stream join with watermark bounds: clicks ⋈ purchases within
a time window — Structured Streaming's bounded-state join (state evicts
past the watermark, so it runs indefinitely at scale)."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

from pyspark.sql import functions as F


def test_stream_stream_interval_join(spark):
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        clicks_dir = Path(d) / "clicks"
        buys_dir = Path(d) / "buys"
        ckpt = Path(d) / "ckpt"
        clicks_dir.mkdir()
        buys_dir.mkdir()

        base = "2024-01-01T00:{m:02d}:00"
        clicks = [
            {"user_id": 1, "click_ts": base.format(m=0), "page": "p1"},
            {"user_id": 1, "click_ts": base.format(m=30), "page": "p2"},
            {"user_id": 2, "click_ts": base.format(m=5), "page": "p3"},
        ]
        # purchase at 00:10 joins the 00:00 click (within 15 min), not the 00:30 one
        buys = [
            {"user_id": 1, "buy_ts": base.format(m=10), "amount": 9.99},
        ]
        (clicks_dir / "c.json").write_text("\n".join(json.dumps(r) for r in clicks))
        (buys_dir / "b.json").write_text("\n".join(json.dumps(r) for r in buys))

        c_stream = (
            spark.readStream.schema("user_id long, click_ts timestamp, page string")
            .json(str(clicks_dir))
            .withWatermark("click_ts", "1 hour")
        )
        b_stream = (
            spark.readStream.schema("user_id long, buy_ts timestamp, amount double")
            .json(str(buys_dir))
            .withWatermark("buy_ts", "1 hour")
        )
        joined = c_stream.join(
            b_stream,
            (c_stream.user_id == b_stream.user_id)
            & (b_stream.buy_ts >= c_stream.click_ts)
            & (b_stream.buy_ts <= c_stream.click_ts + F.expr("INTERVAL 15 MINUTES")),
            "inner",
        )
        rows = []
        q = (
            joined.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert len(rows) == 1
        assert rows[0].page == "p1" and rows[0].amount == 9.99
