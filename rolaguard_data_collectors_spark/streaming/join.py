"""Watermarked stream-stream correlation join — the declarative
formulation of op 34 (SURVEY.md §2A: "Stream-stream left outer join on
(dev_addr, f_count) with watermark + small join window").

``enrich_per_collector`` (enrich.py) reproduces the reference's exact
arrival-order buffer semantics; this module gives the watermark-based
alternative: gateway packets LEFT OUTER JOIN application packets on
(data_collector_id, f_count) with the application message required to
arrive within ``join_window`` after the gateway packet. Late data
within the watermark still joins; unmatched gateway packets emit with
null enrichment once the watermark passes — bounded state, no
arrival-order assumption.

Trade-off vs enrich.py (both are faithful to different degrees):
- join: declarative, state bounded by watermark, parallel per key —
  the 100 TB-friendly default when a small reordering window is
  acceptable;
- enrich.py: exact reference semantics (1-row buffer, flush on next
  arrival) — needed when byte-for-byte parity with the reference's
  output order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GW_TOPIC = "^gateway/.+/(rx|tx|up)$"
# reference app route is /rx only (LoraServerIOCollector.py:404-405)
APP_TOPIC = "application/.+?/(device|node)/.+/rx$"


def correlate_gateway_app_join(
    packets: DataFrame,
    watermark: str = "30 seconds",
    join_window_seconds: int = 10,
) -> DataFrame:
    """Normalized packet stream -> gateway rows enriched by the
    matching application row (same collector, equal f_count, app
    arriving within the window), LEFT OUTER so unmatched gateway
    packets still emit when the watermark closes them.

    Scale: both sides shuffle on (data_collector_id, f_count); state
    per side is bounded by watermark x ingest rate. AQE/skew handling
    applies as with any keyed shuffle.
    """
    gw = (
        packets.filter(F.col("topic").rlike(GW_TOPIC))
        .select(
            F.col("_seq").alias("gw_seq"),
            F.col("data_collector_id").alias("gw_dcid"),
            F.col("topic").alias("gw_topic"),
            F.col("dev_addr"),
            F.col("m_type"),
            F.col("f_count").alias("gw_f_count"),
            F.col("date").alias("gw_time"),
        )
        .withWatermark("gw_time", watermark)
    )
    app = (
        packets.filter(F.col("topic").rlike(APP_TOPIC))
        .select(
            F.col("data_collector_id").alias("app_dcid"),
            F.col("f_count").alias("app_f_count"),
            F.col("app_name"),
            F.col("dev_name"),
            F.col("gw_name"),
            F.col("latitude"),
            F.col("longitude"),
            F.col("altitude"),
            F.col("date").alias("app_time"),
        )
        .withWatermark("app_time", watermark)
    )
    cond = (
        (F.col("gw_dcid") == F.col("app_dcid"))
        & (F.col("gw_f_count") == F.col("app_f_count"))
        & (F.col("app_time") >= F.col("gw_time"))
        & (
            F.col("app_time")
            <= F.col("gw_time") + F.expr(f"INTERVAL {join_window_seconds} SECONDS")
        )
    )
    return gw.join(app, cond, "leftOuter").select(
        "gw_seq",
        F.col("gw_dcid").alias("data_collector_id"),
        "dev_addr",
        "m_type",
        F.col("gw_f_count").alias("f_count"),
        "gw_time",
        "app_name",
        "dev_name",
        "gw_name",
        "latitude",
        "longitude",
        "altitude",
        (F.col("app_name").isNotNull()).alias("merged"),
    )
