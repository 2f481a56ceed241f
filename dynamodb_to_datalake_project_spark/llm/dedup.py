"""Corpus deduplication: exact, blocked n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design notes (all operators shuffle on bounded keys, never
all-pairs):
- exact: one hash aggregation on content hash.
- blocked Jaccard: candidate generation via equi-join on a blocking key
  (text prefix) — the all-pairs O(n²) never materializes.
- MinHash+LSH: shingle→signature (one explode + min-agg shuffle) →
  band-bucket equi-join → exact verify on candidates only. Classic
  banding: P(candidate) ≈ 1-(1-j^r)^b.
- SimHash: 32-bit signature via per-bit weighted sums; candidate pairs
  via byte-band pigeonhole (hamming ≤ 3 ⇒ at least one of 4 bytes
  equal), verified with bit_count(xor).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.llm.text import shingle_set, tokens


def _shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select("doc_id", shingle_set(F.col("text"), n).alias("w"))


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content,
    keeping the smallest id (deterministic canonical survivor)."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def jaccard(a, b) -> F.Column:
    """Exact Jaccard over two (distinct-element) array columns."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def blocked_jaccard_pairs(
    docs: DataFrame,
    block_key,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate pairs via blocking-key equi-join + exact
    shingle-Jaccard verify."""
    d = docs.select(
        "doc_id", block_key.alias("blk"), shingle_set(F.col("text"), shingle_n).alias("w")
    )
    a, b = d.alias("a"), d.alias("b")
    pair = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    j = jaccard(F.col("a.w"), F.col("b.w"))
    return (
        pair.select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            j.alias("j"),
        )
        .filter(F.col("j") >= threshold)
        .select("a_id", "b_id", F.col("j").alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 32, id_col: str = "doc_id", tokens_col: str = "w"
) -> DataFrame:
    """Per-doc MinHash signature: mh_i = min over tokens of
    xxhash64(i, token). One explode + one partial-aggregated min-shuffle;
    no UDFs, deterministic across runs/engines."""
    tok = docs.select(id_col, F.explode(tokens_col).alias("tok"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs_with_tokens: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, exact-Jaccard verified.

    docs_with_tokens: (doc_id, w: array<string> distinct tokens).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs_with_tokens, num_hashes)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[F.col(f"mh_{bi * rows + r}") for r in range(rows)]).alias(
                    "sig"
                ),
            )
            for bi in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    d = docs_with_tokens
    verified = (
        cand.join(d.select(F.col("doc_id").alias("a_id"), F.col("w").alias("wa")), "a_id")
        .join(d.select(F.col("doc_id").alias("b_id"), F.col("w").alias("wb")), "b_id")
        .withColumn("j", jaccard(F.col("wa"), F.col("wb")))
        .filter(F.col("j") >= threshold)
        .select("a_id", "b_id", F.col("j").alias("jaccard"))
    )
    return verified


def simhash_signatures(docs_with_tokens: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash: bit i of the signature is the sign of
    sum over tokens of (token-hash bit i ? +1 : -1)."""
    tok = docs_with_tokens.select("doc_id", F.explode("w").alias("tok")).select(
        "doc_id", F.xxhash64("tok").alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_sums)
    sig = functools.reduce(
        lambda acc, i: acc
        + F.when(F.col(f"b_{i}") > 0, F.lit(2**i).cast("long")).otherwise(0),
        range(bits),
        F.lit(0).cast("long"),
    )
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs_with_tokens: DataFrame, bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidates: pigeonhole on 4 byte-bands (ham ≤ 3 over 32 bits ⇒ some
    band is identical), so candidate generation is an equi-join, never
    all-pairs.
    """
    sig = simhash_signatures(docs_with_tokens, bits)
    n_bands = bits // 8
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("simhash"), bi * 8).bitwiseAND(F.lit(255)).alias("bv"),
            )
            for bi in range(n_bands)
        ]
    )
    banded = sig.select("doc_id", "simhash", F.explode(band_structs).alias("bs")).select(
        "doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bv").alias("bv")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Catalog entries
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM corpus GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup over a corpus with planted duplicates (the fixture ∪
    an id-shifted copy of itself): every text has ≥2 copies; survivor is
    the min doc_id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return exact_dedup(corpus, "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id, substr(text, 1, 32) AS blk,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), d AS (
      SELECT doc_id, blk,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [array_to_string(toks, ' ')] END AS w
      FROM t
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.w, b.w)) * 1.0
                 / len(list_distinct(list_concat(a.w, b.w))) AS jaccard
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.w, b.w)) * 1.0
          / len(list_distinct(list_concat(a.w, b.w))) >= 0.8
    """,
)
def q_dedup_jaccard(spark, sf_dir):
    """Prefix-blocked 3-gram-shingle Jaccard near-dup detection
    (catches the fixture's planted duplicate pairs; shingles keep
    unrelated small-vocab docs apart)."""
    docs = load_table(spark, sf_dir, "documents")
    return blocked_jaccard_pairs(docs, F.substring("text", 1, 32), threshold=0.8)


@query("dedup_minhash_lsh")  # rows-only: banding not expressible in ANSI SQL
def q_dedup_minhash(spark, sf_dir):
    """Banding tuned for this corpus: the synthetic vocab is tiny, so
    unrelated docs already share ~0.6 of their word sets — b=4, r=16
    keeps P(candidate) ≈ 0.002 at j=0.62 but ≈ 0.9 at j=0.95 (the
    planted dups)."""
    docs = _shingle_sets(load_table(spark, sf_dir, "documents"))
    return minhash_lsh_pairs(docs, num_hashes=64, bands=4, threshold=0.8)


@query("dedup_simhash")  # rows-only
def q_dedup_simhash(spark, sf_dir):
    docs = _shingle_sets(load_table(spark, sf_dir, "documents"))
    return simhash_pairs(docs, bits=48, max_hamming=3)
