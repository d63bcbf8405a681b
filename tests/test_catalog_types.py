"""Drift guard: timestamp columns must resolve to TIMESTAMP (not
TIMESTAMP_NTZ, not raw longs) regardless of how the driver wrote the
parquet (nanos-as-long, micros-NTZ, or micros-UTC). Every
unix_micros()/window() call site in the engine requires TimestampType,
so a parquet-writer change must fail here, loudly, instead of deep in
a driver correctness run.
"""

from pyspark.sql import types as T

from rolaguard_data_collectors_spark.catalog import (
    TIMESTAMP_COLS,
    load_table,
)


def test_timestamp_cols_resolve_to_timestamp(spark, sf_dir):
    for name, cols in TIMESTAMP_COLS.items():
        df = load_table(spark, sf_dir, name)
        for col in cols:
            dtype = df.schema[col].dataType
            assert isinstance(dtype, T.TimestampType), (
                f"{name}.{col} resolved to {dtype}; catalog.load_table "
                "must normalize it to TIMESTAMP"
            )


def test_unix_micros_works_on_events_ts(spark, sf_dir):
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    row = df.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] is not None
