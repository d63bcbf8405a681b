"""Z-order clustering (plans/scale.py): bit-interleave correctness
against a Python reference, and the skipping PROOF — a 2-D box
predicate can skip most files of a z-clustered layout via parquet
footer stats alone, and almost none of a round-robin layout of the
same rows."""

import os

import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.catalog import load_table
from rolaguard_data_collectors_spark.plans.scale import (
    file_minmax_stats,
    skippable_fraction,
    write_zordered,
    zorder_value,
)


def _py_zorder(xr: int, yr: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((xr >> j) & 1) << (2 * j)
        z |= ((yr >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_value_matches_python_reference(spark):
    # ranks over [0, 15] with bits=4 -> ranks are the values themselves
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y",
            zorder_value(F.col("x"), F.col("y"), 0, 15, 0, 15, bits=4).alias("z"),
        ).collect()
    }
    for x, y in rows:
        assert out[(x, y)] == _py_zorder(x, y, 4), (x, y)


def test_zorder_locality_beats_linear_order(spark):
    # z-values of a 2-D neighborhood must span a far smaller range than
    # the same neighborhood under x-major linear order (the property
    # file clustering relies on).
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")
    z = zorder_value(F.col("x"), F.col("y"), 0, 63, 0, 63, bits=6)
    got = (
        df.filter((F.col("x") < 8) & (F.col("y") < 8))
        .agg(F.max(z) - F.min(z))
        .first()[0]
    )
    assert got <= 63  # 8x8 block occupies one contiguous z range
    linear = 7 * 64 + 7  # same block under x-major order spans ~7 rows
    assert got < linear


@pytest.mark.parametrize("layout", ["zorder", "roundrobin"])
def test_box_predicate_skipping(spark, sf_dir, tmp_path, layout):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / layout)
    if layout == "zorder":
        write_zordered(ev, path, "user_id", "value", files=16)
    else:
        ev.repartition(16).write.mode("overwrite").parquet(path)

    stats = file_minmax_stats(path, ["user_id", "value"])
    assert len(stats) >= 8  # the rewrite actually split into files

    lo_u = ev.agg(F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")).first()
    u_span, v_span = lo_u[1] - lo_u[0], lo_u[3] - lo_u[2]
    box = {
        "user_id": (lo_u[0], lo_u[0] + u_span * 0.2),
        "value": (lo_u[2], lo_u[2] + v_span * 0.2),
    }
    frac = skippable_fraction(stats, box)
    if layout == "zorder":
        # a 20%x20% box touches a small corner of the z-curve: most
        # files' footer stats miss it entirely
        assert frac >= 0.5, stats
    else:
        # round-robin files all span ~the full range: nothing skips
        assert frac <= 0.1, stats

    # read-back equality: clustering must not change the rows
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    )


def test_scan_prunes_row_groups_on_zordered_layout(spark, sf_dir, tmp_path):
    """End-to-end: a Spark scan over the z-clustered layout pushes the
    box predicate down to parquet (PushedFilters) and returns exactly
    the rows a full scan would."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "z2")
    write_zordered(ev, path, "user_id", "value", files=16)
    back = spark.read.parquet(path)
    pred = (F.col("user_id") <= 100) & (F.col("value") <= 50)
    plan = back.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThanOrEqual" in plan, plan
    expect = ev.filter(pred).agg(F.count("*"), F.sum("event_id")).first()
    got = back.filter(pred).agg(F.count("*"), F.sum("event_id")).first()
    assert tuple(got) == tuple(expect)


def test_compact_partitions_content_identical(spark, sf_dir, tmp_path):
    """Round 9: small-files compaction over an append-accumulated IVF
    posting table — rewritten partitions end at target_files files
    with content identical row-for-row; partitions under the threshold
    keep their exact files; scratch is gone afterwards."""
    import os

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.llm.kmeans import (
        _emb,
        ivf_index_append,
        persist_ivf_index,
    )
    from rolaguard_data_collectors_spark.plans.scale import compact_partitions

    path = str(tmp_path / "ivf_c")
    persist_ivf_index(spark, sf_dir, path, k=6, iters=1)
    emb = _emb(spark, sf_dir)
    for i in range(5):
        ivf_index_append(
            spark, path,
            emb.where(F.col("vec_id") % 5 == i).select(
                (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"), "v"
            ),
        )
    posts = path + "/postings"

    def snapshot():
        return sorted(
            (r["vec_id"], r["cluster"], tuple(r["v"]))
            for r in spark.read.parquet(posts).collect()
        )

    def files_of(d):
        return sorted(
            f for f in os.listdir(os.path.join(posts, d))
            if f.startswith(("part-", "epoch"))
        )

    before = snapshot()
    parts = [d for d in os.listdir(posts) if d.startswith("cluster=")]
    before_files = {d: files_of(d) for d in parts}
    MAXF = 3
    compacted = compact_partitions(spark, posts, max_files=MAXF, target_files=1)
    assert compacted, before_files  # the appends created small files
    assert snapshot() == before
    assert not os.path.exists(os.path.join(posts, "_compact_tmp"))
    for d in parts:
        if d in compacted:
            assert len(files_of(d)) == 1, d
            assert len(before_files[d]) > MAXF
        else:
            assert files_of(d) == before_files[d], d


def test_expire_partitions_day_retention(spark, sf_dir, tmp_path):
    """Retention drops whole day directories below the cutoff, keeps
    the NULL-sentinel partition, and the surviving table equals the
    same grains filtered to the kept days."""
    import datetime
    import os

    import pandas as pd

    from rolaguard_data_collectors_spark.operators.cascade import (
        _NULL_DAY,
        CascadeMaintenanceSink,
        read_grain,
    )
    from rolaguard_data_collectors_spark.plans.scale import expire_partitions

    # three days + a NULL-ts bucket through the maintenance sink
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(t0 + datetime.timedelta(days=d), "click", 1.0 + d) for d in range(3)]
    rows.append((None, "x", 9.0))
    path = str(tmp_path / "casc_ret")
    sink = CascadeMaintenanceSink(path)
    sink(spark.createDataFrame(rows, "ts timestamp, event_type string, value double"), 0)

    droot = os.path.join(path, "day")
    dropped = expire_partitions(droot, before="2024-03-02")
    assert dropped == ["_d=2024-03-01"]
    left = {r["window_start"] for r in read_grain(spark, path, "day").collect()}
    assert left == {None, datetime.datetime(2024, 3, 2), datetime.datetime(2024, 3, 3)}
    # keep= allow-list form, sentinel listed explicitly
    dropped2 = expire_partitions(droot, keep={"2024-03-03", _NULL_DAY})
    assert dropped2 == ["_d=2024-03-02"]
    left2 = {r["window_start"] for r in read_grain(spark, path, "day").collect()}
    assert left2 == {None, datetime.datetime(2024, 3, 3)}


def test_compact_partitions_recovers_from_crash_mid_swap(spark, tmp_path):
    """Round-9 review fix: a compaction killed between rmtree(live) and
    rename left the partition's ONLY copy in scratch, and a re-run used
    to delete that scratch on entry — data loss. With the _SWAP marker,
    a re-run first FINISHES the interrupted swap from the surviving
    scratch, then proceeds to compact normally."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.plans.scale import compact_partitions

    root = str(tmp_path / "tbl")
    df = spark.range(600).select(
        (F.col("id") % 2).cast("string").alias("_d"), F.col("id").alias("x")
    )
    # 6 files per partition
    df.repartition(6).write.partitionBy("_d").parquet(root)

    def rows():
        return sorted(r["x"] for r in spark.read.parquet(root).collect())

    before = rows()
    # construct the crashed state for _d=0: staged copy + marker, live gone
    scratch = os.path.join(root, "_compact_tmp")
    spark.read.parquet(os.path.join(root, "_d=0")).coalesce(1).write.parquet(
        os.path.join(scratch, "_d=0")
    )
    with open(os.path.join(scratch, "_SWAP"), "w") as fh:
        fh.write("staged\n")
    shutil.rmtree(os.path.join(root, "_d=0"))  # crash was here

    compacted = compact_partitions(spark, root, max_files=3, target_files=1)
    assert rows() == before  # nothing lost
    assert "_d=0" in compacted and "_d=1" in compacted
    for d in ("_d=0", "_d=1"):
        n = sum(1 for f in os.listdir(os.path.join(root, d))
                if f.startswith("part-"))
        assert n == 1, d
    assert not os.path.exists(scratch)
