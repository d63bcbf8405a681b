"""Op 32/8: parse-error routing — corrupt frames still persist with an
``error`` column, and feed the FAILED_PARSING side-output; plus the
StreamingQueryListener-based status tracking."""

from __future__ import annotations

import json

from rolaguard_data_collectors_spark.streaming.normalize import normalize_chirpstack
from rolaguard_data_collectors_spark.streaming.orchestrator import (
    CollectorManager,
    QueryStatusListener,
)
from rolaguard_data_collectors_spark.streaming.sink import split_errors
from tests.test_streaming import DATA_UP_B64, _raw_df


def test_parse_error_routing_and_side_output(spark):
    good = json.dumps(
        {"phyPayload": DATA_UP_B64,
         "rxInfo": {"rssi": -60.0, "mac": "aabbccddeeff0011"}}
    )
    corrupt = json.dumps(
        {"phyPayload": "AAAA",  # 3 bytes: too short for any LoRaWAN frame
         "rxInfo": {"rssi": -61.0, "mac": "aabbccddeeff0011"}}
    )
    rows = [
        {"seq": 0, "ts": 1700000000, "topic": "gateway/aabb/rx", "value": good,
         "data_collector_id": 9, "organization_id": 1},
        {"seq": 1, "ts": 1700000001, "topic": "gateway/aabb/rx", "value": corrupt,
         "data_collector_id": 9, "organization_id": 1},
    ]
    packets, errors = split_errors(normalize_chirpstack(_raw_df(spark, rows)))
    got = {r["_seq"]: r.asDict() for r in packets.collect()}
    # corrupt frame still persisted (PhyParser.py:10-12: error recorded,
    # packet saved anyway), radio metadata intact
    assert len(got) == 2
    assert got[0]["error"] is None and got[0]["dev_addr"] == "017fc1c4"
    assert got[1]["error"] is not None and got[1]["rssi"] == -61.0
    assert got[1]["dev_addr"] is None
    errs = errors.collect()
    assert len(errs) == 1
    assert errs[0]["type"] == "FAILED_PARSING"
    assert errs[0]["data_collector_id"] == 9 and errs[0]["message"]


def test_query_status_listener(spark, tmp_path):
    mgr = CollectorManager(spark, str(tmp_path))
    listener = QueryStatusListener(mgr)
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.format("noop")
            .queryName("listener_probe")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
        import time

        deadline = time.time() + 30  # listener events are async
        while time.time() < deadline:
            stats = [(e.type or "", e.status) for e in mgr.status_events]
            if ("listener_probe", "CONNECTED") in stats and any(
                s == "DISCONNECTED" for _, s in stats
            ):
                break
            time.sleep(0.5)
        stats = [(e.type or "", e.status) for e in mgr.status_events]
        assert ("listener_probe", "CONNECTED") in stats
        assert any(s == "DISCONNECTED" for _, s in stats)
    finally:
        spark.streams.removeListener(listener)
