"""Adversarial-corpus parity fuzzing: the driver-facing oracle
harness only exercises the generated testdata, which contains no NULL
text, no empty strings, and no window-boundary document lengths — the
exact inputs where a Spark build and its DuckDB oracle drift apart
(round-6 review: the substring-dup oracle emitted NULL arithmetic for
NULL text while Spark rejoined those rows as zeros).

This suite materializes tiny hand-adversarial `documents` corpora to a
temp directory and runs build-vs-oracle through the SAME comparator
the parity suite uses (oracle.compare: pandas-materialized, strict
stringified cells, dtype pinning), for the operators whose oracles
contain length/NULL-sensitive arithmetic."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import rolaguard_data_collectors_spark.llm.dsir as dsir_mod
import rolaguard_data_collectors_spark.llm.text as text_mod
from rolaguard_data_collectors_spark.oracle import compare

# doc_id, text, lang, source, n_chars — the documents schema.
# Adversarial axes: NULL text, empty, whitespace-only, below/at/above
# the 40-char substring window, exactly one window, stride-boundary
# lengths, unicode + regex metacharacters, exact cross-doc duplicates,
# and a shared 60-char span embedded in different documents.
_SHARED = "the quick brown fox jumps over the lazy dog again and again"  # 60
_DOCS = [
    (0, None, "en", "s0"),
    (1, "", "en", "s0"),
    (2, "   ", "de", "s1"),
    (3, "short text", "en", "s1"),
    (4, "x" * 39, "fr", "s1"),
    (5, "y" * 40, "fr", "s1"),
    (6, "z" * 41, "es", "s2"),
    (7, "a" * 50, "es", "s2"),
    (8, "b" * 51, "zh", "s2"),
    (9, f"prefix one {_SHARED} suffix alpha", "en", "s3"),
    (10, f"prefix two {_SHARED} suffix beta", "en", "s3"),
    (11, "unicode héllo wörld 你好 émoji ™ () [] .* \\ $ ^ end", "und", "s4"),
    (12, "dup dup dup dup dup dup dup dup dup dup dup dup", "en", "s5"),
    (13, "dup dup dup dup dup dup dup dup dup dup dup dup", "en", "s5"),
    (14, "the of and to in is a " * 6, "en", "s6"),
    # astral-plane codepoints (UTF-16 surrogate pairs in the JVM) and
    # combining marks: length()/substr() must agree codepoint-wise
    # across a JVM engine and a UTF-8-native one
    (15, "astral \U0001F600\U0001F680 pair é combining ñ end", "und", "s7"),
    # one unbroken 400-char token: tokenizers, mean-word-length and
    # the 40-char substring windows all hit the no-spaces edge
    (16, "w" * 400, "en", "s7"),
    # NULL lang and NULL source: grouping keys of the curation split,
    # DSIR's target-language selector, and every per-source profile
    (17, "plain text with a null language tag", None, "s8"),
    (18, "plain text with a null source tag", "en", None),
]


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t) if t is not None else 0,
            }
            for i, t, lang, src in _DOCS
        ]
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(fuzz_dir, 'documents.parquet')}'"
    )
    return con


def _check(name, spark_df, oracle_sql, con):
    r = compare(name, spark_df, oracle_sql, con)
    assert r.ok, f"{name}: {r.detail}"
    assert r.exact_match, f"{name}: {r.detail}"
    assert r.dtypes_match, f"{name}: {r.dtype_skews}"


def _spec(qname):
    """Resolve a query spec: the driver registry plus the unregistered
    building blocks that keep their own oracle (clean_corpus ceded its
    slot to clean_corpus_semantic in round 8 but stays fuzz-covered)."""
    from rolaguard_data_collectors_spark.llm.pipeline import CLEAN_CORPUS_SPEC
    from rolaguard_data_collectors_spark.registry import collect_all

    merged = dict(collect_all())
    merged.setdefault("clean_corpus", CLEAN_CORPUS_SPEC)
    return merged[qname]


def test_substring_dup_profile_fuzz(spark, fuzz_dir, fuzz_con):
    from rolaguard_data_collectors_spark.catalog import load_table

    docs = load_table(spark, fuzz_dir, "documents")
    _check(
        "substring_dup_profile",
        text_mod.substring_dup_profile(docs),
        text_mod.SUBSTRING_DUP_SQL,
        fuzz_con,
    )


def test_dsir_importance_fuzz(spark, fuzz_dir, fuzz_con):
    _check(
        "dsir_importance",
        dsir_mod.dsir_importance(spark, fuzz_dir),
        dsir_mod.DSIR_ORACLE,
        fuzz_con,
    )


def test_text_profile_fuzz(spark, fuzz_dir, fuzz_con):
    """The full 23-column profile over the adversarial corpus — this
    is the widest oracle in the repo and the one that has drifted
    before (HUGEINT skew r5, NULL-window arithmetic r6)."""
    _check(
        "text_profile",
        text_mod.text_profile(spark, fuzz_dir),
        text_mod.TEXT_PROFILE_ORACLE,
        fuzz_con,
    )


@pytest.mark.parametrize(
    "qname",
    ["dedup_exact", "ngram_jaccard_dedup", "minhash_lsh_buckets",
     "simhash_profile", "tfidf_top_terms", "clean_corpus",
     "pii_redaction_profile",
     # round 7: the multimodal queries (and the binary scalar chain)
     # read payload bytes derived from the same documents table —
     # NULL/empty/unicode text through the binary-cast, sniff-dispatch,
     # and perceptual-dedup legs
     "multimodal_binary_profile", "multimodal_decode_features",
     "scalar_binary_chain"],
)
def test_documents_query_fuzz(spark, fuzz_dir, fuzz_con, qname):
    """Registered documents-only queries over the adversarial corpus:
    the dedup family's oracles are the most hash-arithmetic-dense in
    the repo, and none of them has ever seen a NULL or boundary-length
    document before this suite."""
    spec = _spec(qname)
    _check(qname, spec.build(spark, fuzz_dir), spec.oracle, fuzz_con)


# --- adversarial lineitem: NULL group keys, NULL measures ----------------

_LI_ROWS = [
    # (orderkey, partkey, suppkey, quantity, price, returnflag, linestatus)
    (1, 10, 100, 1.0, 900.05, "A", "F"),
    (2, 10, 101, 2.0, 901.15, "A", "O"),
    (3, 11, 100, 3.0, 902.25, "R", "F"),
    (4, None, 100, 4.0, 903.35, "R", "O"),     # NULL measure key
    (5, 12, None, 5.0, 904.45, "R", "F"),      # NULL measure key
    (6, 13, 102, 6.0, 905.55, None, "O"),      # NULL group key
    (7, None, None, 7.0, 906.65, None, "F"),   # NULL everything
    (8, 14, 103, None, None, "N", "O"),        # NULL measures
    (9, 14, 103, 9.0, 908.85, "N", "O"),
    (10, 15, 104, 10.0, 909.95, "G", "F"),     # single-row group
]


@pytest.fixture(scope="module")
def li_fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_li")
    pdf = pd.DataFrame(
        [
            {
                "l_orderkey": ok,
                "l_partkey": pk,
                "l_suppkey": sk,
                "l_linenumber": 1,
                "l_quantity": q,
                "l_extendedprice": p,
                "l_discount": 0.01,
                "l_tax": 0.02,
                "l_returnflag": rf,
                "l_linestatus": ls,
                "l_shipdate": pd.Timestamp("2024-01-01"),
            }
            for ok, pk, sk, q, p, rf, ls in _LI_ROWS
        ]
    )
    # nullable int64 for the key columns (plain int64 would coerce
    # None to NaN-float)
    for c in ("l_partkey", "l_suppkey"):
        pdf[c] = pdf[c].astype("Int64")
    pdf.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def li_fuzz_con(li_fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(li_fuzz_dir, 'lineitem.parquet')}'"
    )
    return con


@pytest.mark.parametrize(
    "qname", ["pivot_distinct_summary", "exact_percentiles", "approx_aggregates"]
)
def test_lineitem_query_fuzz(spark, li_fuzz_dir, li_fuzz_con, qname):
    """NULL group keys survive GROUP BY but vanish through equi-joins;
    NULL measure keys count differently under count(DISTINCT) vs
    distinct()+count(*) — exactly the class the round-6 review flagged
    in the split multi-distinct plan. This pins the fixed behavior."""
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, li_fuzz_dir), spec.oracle, li_fuzz_con)


# --- adversarial orders + customer: NULL join keys and dates -------------


@pytest.fixture(scope="module")
def star_fuzz_dir(spark, li_fuzz_dir, tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("fuzz_star")
    shutil.copy(
        os.path.join(li_fuzz_dir, "lineitem.parquet"),
        os.path.join(d, "lineitem.parquet"),
    )
    orders = pd.DataFrame(
        [
            # (orderkey, custkey, status, total, date, priority)
            (1, 100, "O", 10.0, "2024-01-10", "1-URGENT"),
            (2, 100, "F", 20.0, "2024-01-20", "2-HIGH"),
            (3, None, "O", 30.0, "2024-02-01", "1-URGENT"),   # NULL custkey
            (4, 101, "F", None, "2024-02-10", None),          # NULL price/prio
            (5, 102, "O", 50.0, None, "3-MEDIUM"),            # NULL date
            (None, 103, "F", 60.0, "2024-03-01", "2-HIGH"),   # NULL orderkey
            (7, 999, "O", 70.0, "2024-03-05", "1-URGENT"),    # dangling custkey
        ],
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    for c in ("o_orderkey", "o_custkey"):
        orders[c] = orders[c].astype("Int64")
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"])
    orders.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    customer = pd.DataFrame(
        [
            (100, "alice", 1, 10.5, "BUILDING"),
            (101, "bob", 2, -1.25, "MACHINERY"),
            (102, "carol", 1, None, None),                     # NULL bal/seg
            (103, "dave", None, 3.75, "BUILDING"),             # NULL nation
            (None, "eve", 3, 4.5, "BUILDING"),                 # NULL custkey
            (104, "frank", 3, 5.0, "AUTOMOBILE"),              # no orders
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    customer["c_custkey"] = customer["c_custkey"].astype("Int64")
    customer["c_nationkey"] = customer["c_nationkey"].astype("Int32")
    customer.to_parquet(os.path.join(d, "customer.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def star_fuzz_con(star_fuzz_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(star_fuzz_dir, t + '.parquet')}'"
        )
    return con


@pytest.mark.parametrize(
    "qname",
    ["q1_pricing_summary", "q3_shipping_priority", "join_semi_anti",
     "join_left_outer_order_counts", "topk_global_orders",
     "asof_join_orders_lineitem", "grouping_analytics",
     "window_functions_combo", "function_showcase"],
)
def test_star_query_fuzz(spark, star_fuzz_dir, star_fuzz_con, qname):
    """NULL join keys, NULL dates, dangling foreign keys, and
    no-order customers through the relational surface. Queries that
    also read nation/region/part/supplier/events are excluded (only
    the three adversarial tables exist here); a query raising on a
    missing table would fail loudly, not skip."""
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, star_fuzz_dir), spec.oracle, star_fuzz_con)


# --- adversarial events: timestamp ties, NULL keys, session edges --------


@pytest.fixture(scope="module")
def ev_fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_ev")
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # tie-heavy: same user, identical timestamps (ordering hazards)
        (0, t0, 1, "signup", 1.0, '{"k": 1}'),
        (1, t0, 1, "purchase", 2.0, '{"k": 2}'),
        (2, t0, 1, "error", 3.0, '{"k": 3}'),
        # exactly on a 30m session-gap boundary
        (3, t0 + pd.Timedelta(minutes=30), 1, "purchase", 4.0, '{"k": 4}'),
        (4, t0 + pd.Timedelta(minutes=60, seconds=1), 1, "view", 5.0, None),
        # NULL user / NULL value / NULL props
        (5, t0 + pd.Timedelta(minutes=5), None, "view", 6.0, '{"k": 6}'),
        (6, t0 + pd.Timedelta(minutes=6), 2, "purchase", None, '{"k": 7}'),
        # single-event user
        (7, t0 + pd.Timedelta(hours=2), 3, "signup", 8.0, '{"k": 8}'),
        # status flip-flop for change detection
        (8, t0 + pd.Timedelta(hours=3), 4, "error", 9.0, '{"k": 9}'),
        (9, t0 + pd.Timedelta(hours=3, minutes=1), 4, "purchase", 10.0, '{"k": 10}'),
        (10, t0 + pd.Timedelta(hours=3, minutes=2), 4, "error", 11.0, '{"k": 11}'),
        # window-boundary: exactly on the hour
        (11, t0 + pd.Timedelta(hours=4), 5, "view", 12.0, '{"k": 12}'),
        (12, t0 + pd.Timedelta(hours=4, minutes=59, seconds=59), 5, "view", 13.0, '{"k": 13}'),
        # NULL timestamps: a NULL event-time GROUP (GROUP BY treats
        # NULLs as equal; a plain join key would drop it — the
        # packet_summary split-aggregate regression case), and NULL
        # ordering keys through every window/sessionize query
        (13, None, 6, "view", 14.0, '{"k": 14}'),
        (14, None, 6, "purchase", 15.0, '{"k": 15}'),
        (15, None, None, "view", 16.0, '{"k": 16}'),
        # ...and MIXED null/non-null within one user (user 5 has
        # stamped rows above): NULLS FIRST vs LAST now changes which
        # row is "previous" for every arrival-order window
        (16, None, 5, "view", 17.0, '{"k": 17}'),
        # pre-1970 timestamps: NEGATIVE epochs through every
        # floor/epoch/date_trunc expression — integer division and
        # double->long casts truncate toward zero while floor rounds
        # down, so the two only agree when both sides spell the same
        # operation (and a pre-epoch event is a real decode artifact:
        # a zeroed GPS stamp)
        (17, t0 - pd.Timedelta(days=20000), 7, "purchase", 18.0, '{"k": 18}'),
        (18, t0 - pd.Timedelta(days=20000, seconds=1801), 7, "view", 19.5, '{"k": 19}'),
        # sub-second precision: .999999 must truncate DOWN through
        # date_trunc('second')/epoch_s on both engines, never round up
        (19, t0 + pd.Timedelta(seconds=1, microseconds=999999), 7, "purchase", 20.0, '{"k": 20}'),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def ev_fuzz_con(ev_fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(ev_fuzz_dir, 'events.parquet')}'"
    )
    return con


@pytest.mark.parametrize(
    "qname",
    ["prev_packet_correlation", "device_map_enrich", "location_propagation",
     "verification_gate", "status_change_detection", "dedup_first_arrival",
     "sessionize_gap30m", "time_windows", "packet_summary",
     "scalar_decode_chain", "scalar_envelope_chain"],
)
def test_events_query_fuzz(spark, ev_fuzz_dir, ev_fuzz_con, qname):
    """Identical timestamps for one user, session-gap and window
    boundaries, NULL user/value/props — the ordering and edge cases
    the generated events stream (unique micro-timestamps) never
    produces."""
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, ev_fuzz_dir), spec.oracle, ev_fuzz_con)


def test_envelope_serialize_fuzz(spark, ev_fuzz_dir, ev_fuzz_con):
    """The standalone op-28 envelope shadow (scalar_envelope_chain is
    the registered consolidation, but the standalone form keeps its own
    oracle): NULL user/value/props AND NULL ts through the to_json
    envelope — ignoreNullFields=false must keep "ts":null exactly like
    DuckDB's to_json."""
    from rolaguard_data_collectors_spark.operators.scalar import (
        ENVELOPE_SERIALIZE_ORACLE,
        envelope_serialize,
    )

    _check(
        "envelope_serialize",
        envelope_serialize(spark, ev_fuzz_dir),
        ENVELOPE_SERIALIZE_ORACLE,
        ev_fuzz_con,
    )


# --- adversarial embeddings: NULL and degenerate vectors -----------------


@pytest.fixture(scope="module")
def emb_fuzz_dir(spark, tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    vecs = []
    for i in range(24):
        v = rng.randn(64).astype("float32")
        v /= np.linalg.norm(v)
        vecs.append(v.tolist())
    vecs[20] = None                       # NULL embedding
    vecs[21] = [0.0] * 64                 # zero vector (norm 0)
    vecs[22] = vecs[5]                    # exact duplicate of vec 5
    vecs[23] = [float("nan")] + vecs[6][1:]   # corrupt: NaN component
    vecs[19] = [float("inf")] + vecs[7][1:]   # corrupt: Inf component
    tbl = pa.table(
        {
            "vec_id": pa.array(range(24), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(24)], type=pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("fuzz_emb")
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def emb_fuzz_con(emb_fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(emb_fuzz_dir, 'embeddings.parquet')}'"
    )
    return con


@pytest.mark.parametrize(
    "qname",
    ["ann_topk_suite", "ivf_label_topk", "label_centroid_distance",
     "embedding_near_dup_pairs"],
)
def test_embeddings_query_fuzz(spark, emb_fuzz_dir, emb_fuzz_con, qname):
    """NULL embeddings, a zero vector (0/0 cosine), and exact
    duplicates through the ANN surface — crash paths (numpy kernel on
    a None row) as much as value divergence."""
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, emb_fuzz_dir), spec.oracle, emb_fuzz_con)


# --- round 7: single-lang / empty-token corpora through curation + DSIR ---
#
# DSIR's two models coincide when every document is the target lang
# (t_tot == r_tot, t_b == r_b for every bucket -> lr == 0 exactly for
# occupied buckets, log-smoothing residue for the rest), and documents
# with NO alphabetic tokens produce an empty bigram array (the
# sequence(1, 0) guard). Neither shape exists in the generated
# testdata or the mixed-lang fuzz corpus above.

_MONO_DOCS = [
    (0, "alpha beta gamma delta", "en", "s0"),
    (1, "alpha beta gamma delta", "en", "s0"),   # exact dup
    (2, "1234 5678 ... !!! ???", "en", "s1"),    # zero alphabetic tokens
    (3, "", "en", "s1"),
    (4, None, "en", "s1"),
    (5, "solo", "en", "s2"),                      # 1 token -> no bigrams
    (6, "x y", "en", "s2"),                       # exactly one bigram
    (7, "the quick brown fox jumps over the lazy dog", "en", "s3"),
]


@pytest.fixture(scope="module")
def mono_fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_mono")
    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t) if t is not None else 0,
            }
            for i, t, lang, src in _MONO_DOCS
        ]
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def mono_fuzz_con(mono_fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(mono_fuzz_dir, 'documents.parquet')}'"
    )
    return con


def test_dsir_single_lang_corpus_fuzz(spark, mono_fuzz_dir, mono_fuzz_con):
    _check(
        "dsir_importance_mono",
        dsir_mod.dsir_importance(spark, mono_fuzz_dir),
        dsir_mod.DSIR_ORACLE,
        mono_fuzz_con,
    )


@pytest.mark.parametrize(
    "qname", ["curation_sample_pack", "pack_sequence_spans", "clean_corpus"]
)
def test_curation_query_mono_fuzz(spark, mono_fuzz_dir, mono_fuzz_con, qname):
    """The registered curation legs over the single-lang / empty-token
    corpus — the DSIR columns ride curation_sample_pack, so this also
    pins the round-7 distributed rank on a corpus where every
    log-weight ties (one bucket holds everything)."""
    spec = _spec(qname)
    _check(qname, spec.build(spark, mono_fuzz_dir), spec.oracle, mono_fuzz_con)


@pytest.mark.parametrize(
    "qname",
    ["pipeline_mqtt_forwarder", "pipeline_chirpstack_gateway",
     "pipeline_ttn_v2", "pipeline_ttn_v3",
     "lorawan_field_extract", "lorawan_decode_roundtrip",
     "lorawan_security_suite"],
)
def test_lorawan_pipeline_events_fuzz(spark, ev_fuzz_dir, ev_fuzz_con, qname):
    """Round 7: the four pipeline normalizers and the three LoRaWAN
    codec queries over the adversarial events corpus — NULL user_id
    (the gateway mac / dev_eui source column), NULL value (rssi/snr
    arithmetic), NULL props, and identical timestamps all flow into
    the in-plan raw-message synthesis, exercising the JSON build ->
    from_json -> route -> decode chain on inputs the generated
    testdata never produces. (Wire-level garbage — malformed base64,
    truncated protobuf, hostile topics — is covered contract-style in
    tests/test_normalize_adversarial.py; this is the oracle-equality
    leg.)"""
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, ev_fuzz_dir), spec.oracle, ev_fuzz_con)


# --- round 7: dimension-table fuzz — q1/q5/set-ops/part-join --------------
#
# NULL nation keys on BOTH sides of the set ops (set semantics treat
# NULL = NULL — a divergence here would be invisible on the dense
# generated keys), dangling foreign keys through the 6-table q5 join
# chain, NULL part brand/price under the broadcast join, and NULL
# shipdate/discount/tax through q1's filter + arithmetic.


@pytest.fixture(scope="module")
def dims_fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_dims")

    def w(name, df):
        df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)

    li = pd.DataFrame(
        [
            # ok, pk, sk, qty, price, disc, tax, rf, ls, ship
            (1, 10, 100, 1.0, 900.05, 0.01, 0.02, "A", "F", "1995-01-01"),
            (2, 10, 101, 2.0, 901.15, 0.02, 0.03, "A", "O", "1998-09-02"),
            (3, 11, 100, 3.0, 902.25, None, 0.02, "R", "F", "1998-09-03"),
            (4, None, 100, 4.0, 903.35, 0.01, None, "R", "O", "1995-01-01"),
            (5, 999, 999, 5.0, 904.45, 0.0, 0.0, None, "F", None),
            (6, 12, 102, None, None, 0.01, 0.02, "N", None, "1995-06-01"),
        ],
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                 "l_linestatus", "l_shipdate"],
    )
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        li[c] = li[c].astype("Int64")
    li["l_shipdate"] = pd.to_datetime(li["l_shipdate"])
    w("lineitem", li)

    orders = pd.DataFrame(
        [(1, 50, "2024-01-01"), (2, 51, "2024-01-02"), (3, None, None),
         (4, 53, "2024-02-01"), (5, 50, "2024-02-02"), (6, 99, "2024-03-01")],
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    for c in ("o_orderkey", "o_custkey"):
        orders[c] = orders[c].astype("Int64")
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"])
    w("orders", orders)

    customer = pd.DataFrame(
        [(50, 0), (51, None), (53, 1), (54, 7)],
        columns=["c_custkey", "c_nationkey"],
    )
    for c in customer.columns:
        customer[c] = customer[c].astype("Int64")
    w("customer", customer)

    supplier = pd.DataFrame(
        [(100, 0), (101, 1), (102, None), (999, 3)],
        columns=["s_suppkey", "s_nationkey"],
    )
    for c in supplier.columns:
        supplier[c] = supplier[c].astype("Int64")
    w("supplier", supplier)

    nation = pd.DataFrame(
        [(0, "ALGERIA", 0), (1, "BRAZIL", 1), (2, None, None), (3, "CHINA", 9)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    for c in ("n_nationkey", "n_regionkey"):
        nation[c] = nation[c].astype("Int64")
    w("nation", nation)

    region = pd.DataFrame(
        [(0, "AFRICA"), (1, "AMERICA")], columns=["r_regionkey", "r_name"]
    )
    region["r_regionkey"] = region["r_regionkey"].astype("Int64")
    w("region", region)

    part = pd.DataFrame(
        [(10, "Brand#1", 10.5), (11, None, 11.5), (12, "Brand#2", None)],
        columns=["p_partkey", "p_brand", "p_retailprice"],
    )
    part["p_partkey"] = part["p_partkey"].astype("Int64")
    w("part", part)
    return str(d)


@pytest.fixture(scope="module")
def dims_fuzz_con(dims_fuzz_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(dims_fuzz_dir, t + '.parquet')}'"
        )
    return con


@pytest.mark.parametrize(
    "qname",
    ["q1_pricing_summary", "q5_local_supplier_volume", "set_ops_nations",
     "broadcast_part_join"],
)
def test_dims_query_fuzz(spark, dims_fuzz_dir, dims_fuzz_con, qname):
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, dims_fuzz_dir), spec.oracle, dims_fuzz_con)


def test_semantic_dedup_fuzz(spark, emb_fuzz_dir, emb_fuzz_con):
    """SemDeDup (cluster-blocked semantic dedup, llm/kmeans.py) over
    the adversarial embeddings: NULL vectors (no cluster), a zero
    vector (undefined cosine — can't be dropped), NaN/Inf vectors
    (gated at the table boundary), and the planted exact duplicate
    (must be dropped in favor of its smaller vec_id twin). The oracle
    is parameterized by the SAME trained codebook."""
    from rolaguard_data_collectors_spark.llm.kmeans import (
        kmeans_fit,
        semantic_dedup,
        semantic_dedup_oracle_sql,
    )

    centroids, _ = kmeans_fit(spark, emb_fuzz_dir, k=3, iters=2)
    out = semantic_dedup(spark, emb_fuzz_dir, centroids, threshold=0.4)
    _check(
        "semantic_dedup",
        out,
        semantic_dedup_oracle_sql(centroids, threshold=0.4),
        emb_fuzz_con,
    )
    survivors = {r["vec_id"] for r in out.collect()}
    assert 5 in survivors and 22 not in survivors, (
        "the exact-duplicate pair must keep the smaller vec_id"
    )
    assert 21 in survivors, "the zero vector has no defined cosine"
    assert 20 not in survivors and 23 not in survivors and 19 not in survivors, (
        "NULL and non-finite vectors have no cluster"
    )


def test_semantic_dedup_real_corpus(spark):
    """Same operator over the generated sf0.01 embeddings — the
    no-adversarial-rows leg of the oracle comparison."""
    from rolaguard_data_collectors_spark.llm.kmeans import (
        kmeans_fit,
        semantic_dedup,
        semantic_dedup_oracle_sql,
    )

    sfd = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sfd}/embeddings.parquet'"
    )
    centroids, _ = kmeans_fit(spark, sfd, k=4, iters=2)
    out = semantic_dedup(spark, sfd, centroids, threshold=0.4)
    _check(
        "semantic_dedup_real",
        out,
        semantic_dedup_oracle_sql(centroids, threshold=0.4),
        con,
    )


def test_clean_corpus_semantic_composed(spark, fuzz_dir, emb_fuzz_dir, fuzz_con):
    """The full modern pipeline (text clean -> SemDeDup stage) over a
    MIXED corpus: the adversarial documents (ids 0-18) paired with the
    adversarial embeddings (ids 0-23) — partial id overlap, so docs
    without embeddings exercise the keep-if-unembeddable rule, and the
    NULL/zero/NaN/dup vectors flow through the semantic stage."""
    import shutil

    from rolaguard_data_collectors_spark.llm.kmeans import kmeans_fit
    from rolaguard_data_collectors_spark.llm.pipeline import (
        clean_corpus_semantic,
        clean_corpus_semantic_oracle_sql,
    )

    combined = os.path.join(os.path.dirname(fuzz_dir), "fuzz_combined")
    os.makedirs(combined, exist_ok=True)
    shutil.copy(os.path.join(fuzz_dir, "documents.parquet"), combined)
    shutil.copy(os.path.join(emb_fuzz_dir, "embeddings.parquet"), combined)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{combined}/{t}.parquet'"
        )
    centroids, _ = kmeans_fit(spark, combined, k=3, iters=2)
    _check(
        "clean_corpus_semantic",
        clean_corpus_semantic(spark, combined, centroids, threshold=0.4),
        clean_corpus_semantic_oracle_sql(centroids, threshold=0.4),
        con,
    )


def test_clean_corpus_semantic_real_corpus(spark):
    from rolaguard_data_collectors_spark.llm.kmeans import kmeans_fit
    from rolaguard_data_collectors_spark.llm.pipeline import (
        clean_corpus_semantic,
        clean_corpus_semantic_oracle_sql,
    )

    sfd = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfd}/{t}.parquet'")
    centroids, _ = kmeans_fit(spark, sfd, k=4, iters=2)
    _check(
        "clean_corpus_semantic_real",
        clean_corpus_semantic(spark, sfd, centroids, threshold=0.4),
        clean_corpus_semantic_oracle_sql(centroids, threshold=0.4),
        con,
    )


def test_semantic_dedup_cap_sharding_fuzz(spark, emb_fuzz_dir, emb_fuzz_con):
    """Round 8: the cluster-size cap under a cap SMALL enough that the
    fuzz clusters actually shard (ceil(size/cap) > 1). Parity must hold
    with the shard arithmetic mirrored in the oracle, and capping may
    only LOSE drops (cross-shard pairs) — survivors are a superset of
    the uncapped run's."""
    from rolaguard_data_collectors_spark.llm.kmeans import (
        kmeans_fit,
        semantic_dedup,
        semantic_dedup_oracle_sql,
    )

    centroids, _ = kmeans_fit(spark, emb_fuzz_dir, k=2, iters=1)
    capped = semantic_dedup(spark, emb_fuzz_dir, centroids, threshold=0.4,
                            cluster_cap=3)
    _check(
        "semantic_dedup_capped",
        capped,
        semantic_dedup_oracle_sql(centroids, threshold=0.4, cluster_cap=3),
        emb_fuzz_con,
    )
    uncapped = semantic_dedup(spark, emb_fuzz_dir, centroids, threshold=0.4)
    kept_uncapped = {r["vec_id"] for r in uncapped.collect()}
    kept_capped = {r["vec_id"] for r in capped.collect()}
    assert kept_uncapped <= kept_capped
    # cap=1 boundary: every cluster shards to ~singleton blocks — the
    # degenerate everything-is-cross-shard regime; parity must still
    # hold exactly (shard arithmetic mirrored), and nothing crashes
    _check(
        "semantic_dedup_cap1",
        semantic_dedup(spark, emb_fuzz_dir, centroids, threshold=0.4,
                       cluster_cap=1),
        semantic_dedup_oracle_sql(centroids, threshold=0.4, cluster_cap=1),
        emb_fuzz_con,
    )


def test_clean_corpus_semantic_registered_spec(spark, fuzz_dir, emb_fuzz_dir,
                                               fuzz_con):
    """The REGISTERED seed-codebook build + its fully static oracle —
    the exact pair the driver hashes — over the mixed adversarial
    corpus (partial doc/embedding id overlap, NULL/zero/NaN/dup
    vectors)."""
    import shutil

    from rolaguard_data_collectors_spark.registry import collect_all

    combined = os.path.join(os.path.dirname(fuzz_dir), "fuzz_combined_reg")
    os.makedirs(combined, exist_ok=True)
    shutil.copy(os.path.join(fuzz_dir, "documents.parquet"), combined)
    shutil.copy(os.path.join(emb_fuzz_dir, "embeddings.parquet"), combined)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{combined}/{t}.parquet'"
        )
    spec = collect_all()["clean_corpus_semantic"]
    _check("clean_corpus_semantic_registered",
           spec.build(spark, combined), spec.oracle, con)
