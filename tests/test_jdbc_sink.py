"""Op 9 — the JDBC row sink (PacketPersistence.py:12-15, Service.py:5-47),
exercised END-TO-END against Apache Derby embedded (the JDBC engine that
ships inside the Spark distribution for the Hive metastore).

The reference's Postgres sink is disabled in v2.6.0 but its row contract
is still the Service.py:7-46 column list; ``write_packets_jdbc`` is the
foreachBatch body that persists it. Derby gives us a real DriverManager
-> PreparedStatement -> table round trip without adding any jar."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from rolaguard_data_collectors_spark.schemas import PACKET_SCHEMA, PACKET_COLUMNS
from rolaguard_data_collectors_spark.streaming.sink import (
    JDBC_PACKET_COLUMNS,
    jdbc_projection,
    write_packets_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _packet_rows():
    base = {c: None for c in PACKET_COLUMNS}
    r1 = dict(
        base,
        date=datetime.datetime(2021, 3, 14, 9, 26, 53),
        topic="gateway/b827ebfffe87bd11/rx",
        data_collector_id=7,
        organization_id=3,
        gateway="b827ebfffe87bd11",
        tmst=3512348611.0,
        chan=2,
        rfch=0,
        freq=868.5,
        stat=1,
        modu="LORA",
        datr="SF7BW125",
        codr="4/5",
        lsnr=5.1,
        rssi=-35.0,
        size=32,
        data="QDDaAAGAAQABppRkJhXWw7WS",
        m_type="UnconfirmedDataUp",
        major="LoRaWANR1",
        mic="15d6c3b5",
        dev_addr="0100DA30",
        adr=True,
        ack=False,
        adr_ack_req=False,
        f_pending=False,
        class_b=False,
        f_count=256,
        f_port=1,
        latitude=-31.95,
        longitude=115.86,
        altitude=12.0,
        app_name="app-1",
        dev_name="dev-1",
    )
    r2 = dict(
        base,
        date=datetime.datetime(2021, 3, 14, 9, 27, 1),
        topic="gateway/b827ebfffe87bd11/rx",
        data_collector_id=7,
        organization_id=3,
        gateway="b827ebfffe87bd11",
        m_type="JoinRequest",
        major="LoRaWANR1",
        join_eui="70B3D57ED0000000",
        dev_eui="0004A30B001A59BE",
        dev_nonce=4660,
        error=None,
    )
    r3 = dict(base, data_collector_id=9, error="Failed to parse payload")
    return [Row(**{c: r[c] for c in PACKET_COLUMNS}) for r in (r1, r2, r3)]


def test_jdbc_sink_round_trip_derby(spark, tmp_path):
    """write_packets_jdbc against embedded Derby, then read the table
    back through spark.read.jdbc and compare every contract column."""
    db = tmp_path / "packets_db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": DERBY_DRIVER}

    batch = spark.createDataFrame(_packet_rows(), schema=PACKET_SCHEMA)
    write_packets_jdbc(batch, url, "packets", properties=props)

    back = spark.read.jdbc(url, "packets", properties=props)
    assert [c.lower() for c in back.columns] == JDBC_PACKET_COLUMNS

    want = sorted(
        jdbc_projection(batch).collect(),
        key=lambda r: (r.data_collector_id, str(r.date)),
    )
    got = sorted(
        back.toDF(*JDBC_PACKET_COLUMNS).collect(),
        key=lambda r: (r.data_collector_id, str(r.date)),
    )
    assert len(got) == 3
    for w, g in zip(want, got):
        for c in JDBC_PACKET_COLUMNS:
            assert g[c] == w[c], f"column {c}: {g[c]!r} != {w[c]!r}"


def test_jdbc_sink_null_identity_rows(spark, tmp_path):
    """Round-8 fuzz: the normalize fuzz produces packets whose identity
    columns (dev_eui/dev_addr/gateway, even date) are all NULL — e.g. a
    frame with no parseable identity. The row contract has no NOT NULL
    column, so the sink must persist an ALL-NULL row and read it back
    intact rather than crash or drop it."""
    import json as _json

    db = tmp_path / "null_db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": DERBY_DRIVER}

    base = {c: None for c in PACKET_COLUMNS}
    all_null = Row(**{c: base[c] for c in PACKET_COLUMNS})
    # a NULL-identity row that still carries radio metadata, like the
    # fuzz corpus's NULL-user_id events
    partial = dict(base, rssi=-120.0, lsnr=-19.5, size=0,
                   datr=_json.dumps({"spread_factor": "12", "bandwidth": "125"}))
    partial_row = Row(**{c: partial[c] for c in PACKET_COLUMNS})
    batch = spark.createDataFrame([all_null, partial_row], schema=PACKET_SCHEMA)
    write_packets_jdbc(batch, url, "packets", properties=props)

    back = spark.read.jdbc(url, "packets", properties=props).toDF(
        *JDBC_PACKET_COLUMNS
    )
    rows = back.collect()
    assert len(rows) == 2
    nulls = [r for r in rows if r["rssi"] is None]
    kept = [r for r in rows if r["rssi"] is not None]
    assert len(nulls) == 1 and len(kept) == 1
    assert all(nulls[0][c] is None for c in JDBC_PACKET_COLUMNS)
    assert kept[0]["lsnr"] == -19.5 and kept[0]["size"] == 0
    assert all(
        kept[0][c] is None
        for c in ("date", "dev_eui", "dev_addr", "gateway", "m_type")
    )


def test_jdbc_sink_appends_across_batches(spark, tmp_path):
    """foreachBatch delivers one call per epoch; mode('append') must
    accumulate rows, mirroring the reference's per-message INSERT."""
    db = tmp_path / "append_db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": DERBY_DRIVER}

    batch = spark.createDataFrame(_packet_rows(), schema=PACKET_SCHEMA)
    write_packets_jdbc(batch, url, "packets", properties=props)
    write_packets_jdbc(batch, url, "packets", properties=props)

    n = spark.read.jdbc(url, "packets", properties=props).count()
    assert n == 6
