"""Deduplication operators: exact (hash groupBy), blocked n-gram
Jaccard near-dup, MinHash signatures + LSH band bucketing, SimHash.

Design for 100 TB:
- exact dedup is one hash shuffle on md5(text) with map-side partial
  aggregation;
- near-dup NEVER does an unblocked cross join: candidate generation is
  (a) blocking keys (lang, source) or (b) LSH band buckets, both of
  which turn the quadratic pair space into per-bucket joins;
- all hashes use the portable md5-based h32 (portable_sql) so every
  signature and bucket is bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..portable_sql import HASH_PRIME, hex32, minhash_term
from ..registry import QuerySpec

# (a_i, b_i) parameters of the minhash family — fixed, public-knowledge
# construction h_i(x) = (a_i*h(x) + b_i) mod P over a base 32-bit hash.
MINHASH_PARAMS = [
    (1299721, 104729), (15485863, 32452843), (49979687, 67867967),
    (86028121, 472882027), (295075147, 533000389), (613651349, 715225739),
    (797003413, 899809343), (961748927, 982451653),
]
BANDS = 4  # 8 hashes -> 4 bands of 2 rows each


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "documents"))


# --- exact dedup ---------------------------------------------------------


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min doc_id
    (deterministic survivor, unlike dropDuplicates' arbitrary row)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


DEDUP_EXACT_GROUPS_ORACLE = """
SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus: first doc_id per content hash."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_hash")
    )


DEDUP_EXACT_SURVIVORS_ORACLE = """
SELECT min(doc_id) AS doc_id, md5(text) AS content_hash
FROM documents GROUP BY md5(text)
"""


# --- blocked n-gram Jaccard near-dup ------------------------------------


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs blocked by
    (lang, source) — the blocking bounds each join bucket so the pair
    space is per-block quadratic instead of corpus quadratic. Inverted
    index (block, token) self-join counts intersections; union size by
    inclusion-exclusion."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", "source", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("n_b"))
    jacc = F.round(
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


NGRAM_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, source, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / CAST(sa.n_tok + sb.n_tok - n_common AS DOUBLE) >= 0.8
"""


# --- MinHash signatures + LSH bands -------------------------------------


def _minhash_aggs():
    return [
        F.min(F.expr(minhash_term("tok", a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-permutation MinHash signature per document over distinct
    whitespace tokens. One explode + one groupBy(doc_id) — linear, the
    scale path for near-dedup candidate generation."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    return toks.groupBy("doc_id").agg(*_minhash_aggs())


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"min({minhash_term('tok', a, b)}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
)
SELECT doc_id, {mins} FROM toks GROUP BY doc_id
"""


MINHASH_SIGNATURES_ORACLE = _minhash_sig_sql()


def lsh_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the MinHash signature: 4 bands x 2 rows; the
    band key is md5 of the concatenated band values. Output: bucket
    occupancy per band (docs sharing a bucket are near-dup candidates).
    The bucket join — not an all-pairs comparison — is what survives
    100 TB."""
    sig = minhash_signatures(spark, sf_dir)
    bands = []
    for band in range(BANDS):
        lo, hi = 2 * band, 2 * band + 1
        key = F.md5(F.concat_ws("_", F.lit(band), F.col(f"mh{lo}"), F.col(f"mh{hi}")))
        bands.append(
            sig.select(
                F.lit(band).alias("band"), key.alias("bucket"), F.col("doc_id")
            )
        )
    all_bands = bands[0]
    for b in bands[1:]:
        all_bands = all_bands.unionByName(b)
    return (
        all_bands.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def _lsh_band_sql() -> str:
    bands_sql = "\nUNION ALL\n".join(
        f"SELECT {band} AS band, md5(concat_ws('_', {band}, mh{2 * band}, mh{2 * band + 1})) AS bucket, doc_id FROM sig"
        for band in range(BANDS)
    )
    return f"""
WITH sig AS ({_minhash_sig_sql()}),
bands AS ({bands_sql})
SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM bands GROUP BY band, bucket HAVING count(*) > 1
"""


LSH_BAND_BUCKETS_ORACLE = _lsh_band_sql()


# --- SimHash -------------------------------------------------------------


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash: per bit j, sign of sum over tokens of
    (+1 if bit j of h32(tok) else -1); fingerprint packs the signs.
    Near-dups differ in few bits (compare with bit_count(xor)).
    Expressed as 32 conditional sums in one aggregate pass."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    h = F.expr(hex32("tok"))
    toks = toks.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(32):
        term = F.when(F.col(f"s{j}") > 0, 2 ** j).otherwise(0).cast("long")
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    )
    packs = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END" for j in range(32)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), h AS (
  SELECT doc_id, {hex32('tok')} AS h FROM toks
), s AS (
  SELECT doc_id, {sums} FROM h GROUP BY doc_id
)
SELECT doc_id, {packs} AS simhash FROM s
"""


SIMHASH_ORACLE = _simhash_sql()


QUERIES = [
    QuerySpec("dedup_exact_groups", dedup_exact_groups, DEDUP_EXACT_GROUPS_ORACLE,
              "exact dup groups by content hash"),
    QuerySpec("dedup_exact_survivors", dedup_exact_survivors, DEDUP_EXACT_SURVIVORS_ORACLE,
              "deduplicated corpus"),
    QuerySpec("ngram_jaccard_pairs", ngram_jaccard_pairs, NGRAM_JACCARD_ORACLE,
              "blocked exact Jaccard near-dup"),
    QuerySpec("minhash_signatures", minhash_signatures, MINHASH_SIGNATURES_ORACLE,
              "8-perm MinHash signatures"),
    QuerySpec("lsh_band_buckets", lsh_band_buckets, LSH_BAND_BUCKETS_ORACLE,
              "LSH band bucket candidates"),
    QuerySpec("simhash_fingerprints", simhash_fingerprints, SIMHASH_ORACLE,
              "32-bit SimHash"),
]
