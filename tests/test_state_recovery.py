"""Checkpoint recovery: a stateful streaming query stopped mid-feed and
restarted (fresh reader, same checkpoint + cursor) must produce exactly
the batch-shadow result over the combined feed — state crosses the
restart, no replays, no gaps. This is the guarantee the reference
never had (its publisher dropped messages while disconnected,
Publisher.py:113-114)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.catalog import load_table
from rolaguard_data_collectors_spark.operators.stateful import prev_packet_correlation
from rolaguard_data_collectors_spark.sources import register_sources
from rolaguard_data_collectors_spark.streaming.stateful import (
    prev_packet_correlation_stream,
)
from tests.test_streaming import EVENT_SCHEMA


def _write_lines(path, rows, mode):
    with open(path, mode) as fh:
        for r in rows:
            fh.write(
                json.dumps(
                    {
                        "topic": "events",
                        "value": json.dumps(
                            {
                                "event_id": r["event_id"],
                                "user_id": r["user_id"],
                                "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                                "event_type": r["event_type"],
                                "value": r["value"],
                                "props": r["props"],
                            }
                        ),
                        "ts": int(r["ts"].timestamp()),
                    }
                )
                + "\n"
            )


class _RowSink:
    """foreachBatch sink: append rows as JSON lines with an epoch
    commit log (same exactly-once recipe as QueueFileSink)."""

    def __init__(self, out_path: str):
        self.out_path = out_path

    def __call__(self, batch_df, epoch_id):
        commits = self.out_path + ".commits"
        seen = set()
        if os.path.exists(commits):
            with open(commits) as fh:
                seen = {int(x) for x in fh if x.strip()}
        if epoch_id in seen:
            return
        rows = [r.asDict() for r in batch_df.collect()]
        with open(self.out_path, "a") as fh:
            for r in rows:
                fh.write(json.dumps(r, default=str) + "\n")
        with open(commits, "a") as fh:
            fh.write(f"{epoch_id}\n")


def _run_phase(spark, feed_dir, ckpt, out_path):
    raw = (
        spark.readStream.format("lorawan_replay")
        .option("path", str(feed_dir))
        .option("batchSize", 100)
        .option("cursorPath", str(feed_dir) + "/.cursor.json")
        .load()
    )
    j = F.from_json("value", EVENT_SCHEMA)
    events = raw.select(
        j["event_id"].alias("event_id"),
        j["user_id"].alias("user_id"),
        F.to_timestamp(j["ts"]).alias("ts"),
        j["event_type"].alias("event_type"),
        j["value"].alias("value"),
        j["props"].alias("props"),
    )
    q = (
        prev_packet_correlation_stream(events)
        .writeStream.outputMode("append")
        .foreachBatch(_RowSink(out_path))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)


def test_stateful_query_survives_restart(spark, sf_dir, tmp_path):
    register_sources(spark)
    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id").collect()
    feed = tmp_path / "feed"
    feed.mkdir()
    fpath = feed / "collector_1.jsonl"
    out = str(tmp_path / "rows.jsonl")
    ckpt = tmp_path / "ckpt"

    # Phase 1: first 40% of the stream, then stop.
    cut = int(len(ev) * 0.4)
    _write_lines(fpath, ev[:cut], "w")
    _run_phase(spark, feed, ckpt, out)
    with open(out) as fh:
        n_phase1 = len(fh.readlines())
    assert 0 < n_phase1 <= cut

    # Phase 2: append the rest, restart from the same checkpoint.
    _write_lines(fpath, ev[cut:], "a")
    _run_phase(spark, feed, ckpt, out)

    with open(out) as fh:
        got_rows = [json.loads(line) for line in fh]
    # no duplicates across the restart
    ids = [r["event_id"] for r in got_rows]
    assert len(ids) == len(set(ids))
    # combined output == oracle-checked batch shadow over the full feed
    want = {
        (r["event_id"], r["user_id"], str(r["f_count"]), str(r["gw_value"]),
         r["merged"])
        for r in prev_packet_correlation(spark, sf_dir).collect()
    }
    got = {
        (r["event_id"], r["user_id"], str(r["f_count"]), str(r["gw_value"]),
         r["merged"])
        for r in got_rows
    }
    assert got == want
