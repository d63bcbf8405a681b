"""Generate an sf1 (~10x sf0.1) dataset by key-offset replication.

The driver's generator (TESTDATA.md, seed=42) isn't in the repo, so
scale-up evidence beyond sf0.1 replicates sf0.1 ten times with
disjoint key ranges per replica — preserving per-key distributions,
join fan-outs, and null rates exactly, while scaling row counts,
distinct-key cardinality, and shuffle widths 10x. Oracle parity
remains a real check: DuckDB reads the same generated files.

Per-replica transforms:
- fact/dim keys shift by k * (max_key + 1) so FKs stay intra-replica;
- `documents.text` gets a ' replicaK' suffix (k>0) so the corpus
  dup-rate matches sf0.1 instead of every doc acquiring 9 exact
  copies (which would distort the dedup/near-dup group structure);
- `embeddings.embedding` replicas (k>0) are INDEPENDENT deterministic
  hash-derived unit vectors, not perturbed copies (VERDICT r11 item 3:
  a 1e-6 perturbation made every replica a TRUE near-dup of its
  siblings — cosine ~1 >= the 0.4 near-dup threshold — so
  embedding_near_dup_pairs output grew 64x at sf1 and the scale-up
  measurement read manufactured pairs as engine cost). Fresh unit
  vectors keep the corpus distribution (the originals are random unit
  vectors) and give cross-replica cosines ~N(0, 1/64) — indistinguishable
  from more of the same data;
- `events.ts` replicas (k>0) shift by k whole spans (day-granular) so
  the TIME AXIS extends 10x instead of densifying 10x (round-12 find:
  verbatim ts replication made every 30-minute window hold 10x events
  AND created 10x windows, so the bucketed range join's true pair
  count grew 100x — time_windows at sf1 measured data shape, not
  engine cost; real 10x data covers more time at similar density);
- region/nation copy unchanged (fixed dims at every TPC-H SF).

Usage: python scripts/gen_sf1.py [out_dir] [K] [tables_csv]
(defaults: testdata_sf1/, K=10, all tables; K=30 with a table
subset generates the sf3 spot-check slices for the scale curve)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10


def main(out: str, k: int = K, tables: "set[str] | None" = None) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        if tables is not None and t not in tables:
            return
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n:,} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    offs = {}
    for t, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey"), ("orders", "o_orderkey"),
                   ("events", "event_id"), ("documents", "doc_id"),
                   ("embeddings", "vec_id")):
        offs[t] = con.sql(
            f"SELECT max({key}) + 1 FROM {src(t)}"
        ).fetchone()[0]
    offs["user"] = con.sql(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]

    rep = "(SELECT range AS k FROM range(%d)) reps" % k
    write("customer", f"""
        SELECT c_custkey + k * {offs['customer']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')} CROSS JOIN {rep}""")
    write("supplier", f"""
        SELECT s_suppkey + k * {offs['supplier']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {src('supplier')} CROSS JOIN {rep}""")
    write("part", f"""
        SELECT p_partkey + k * {offs['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')} CROSS JOIN {rep}""")
    write("orders", f"""
        SELECT o_orderkey + k * {offs['orders']} AS o_orderkey,
               o_custkey + k * {offs['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')} CROSS JOIN {rep}""")
    write("lineitem", f"""
        SELECT l_orderkey + k * {offs['orders']} AS l_orderkey,
               l_partkey + k * {offs['part']} AS l_partkey,
               l_suppkey + k * {offs['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')} CROSS JOIN {rep}""")
    span_days = con.sql(
        f"SELECT date_diff('day', min(ts), max(ts)) + 1 FROM {src('events')}"
    ).fetchone()[0]
    write("events", f"""
        SELECT event_id + k * {offs['events']} AS event_id,
               ts + (k * {span_days}) * INTERVAL 1 DAY AS ts,
               user_id + k * {offs['user']} AS user_id,
               event_type, value, props
        FROM {src('events')} CROSS JOIN {rep}""")
    write("documents", f"""
        SELECT doc_id + k * {offs['documents']} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE text || ' replica' || k END AS text,
               lang, source,
               CASE WHEN k = 0 THEN n_chars
                    ELSE n_chars + 8 + length(CAST(k AS VARCHAR))
               END AS n_chars
        FROM {src('documents')} CROSS JOIN {rep}""")
    # Replica vectors: deterministic hash-PRNG uniform[-1,1] raws,
    # normalized to unit length (the source corpus is unit vectors) —
    # independent of the original, reproducible, no RNG state.
    write("embeddings", f"""
        WITH reps AS (SELECT range AS k FROM range({k})),
        raws AS (
          SELECT vec_id + k * {offs['embeddings']} AS vec_id, k, label,
                 embedding,
                 list_transform(range(1, len(embedding) + 1),
                   i -> CAST(hash(vec_id * 1000003 + k * 524287 + i)
                             % 2000001 AS DOUBLE) / 1000000.0 - 1.0) AS raw
          FROM {src('embeddings')} CROSS JOIN reps
        )
        SELECT vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_transform(raw, x -> CAST(x /
                         sqrt(list_sum(list_transform(raw, y -> y * y)))
                         AS FLOAT)) END AS embedding,
               label
        FROM raws""")


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1")
    k_arg = int(sys.argv[2]) if len(sys.argv) > 2 else K
    tbls = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    main(out_dir, k_arg, tbls)
