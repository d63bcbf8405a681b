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
