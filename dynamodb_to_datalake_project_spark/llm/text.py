"""Text analysis over document corpora: token stats, quality signals,
language-ID heuristic, fingerprinting.

All pure column expressions (split/filter/transform/regexp/md5) —
JVM-side, whole-stage codegen, linear scans with no shuffle except the
final aggregations. On 100 TB of documents these run at parquet-scan
speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table

#: tiny deterministic stopword list used by quality + lang-id signals
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (trailing-space safe)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def word_tokens(text: Column) -> Column:
    """\\w+ regex tokens — the BPE-ish word/punct split."""
    return F.regexp_extract_all(text, F.lit(r"\w+"), 0)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a token-array column.

    PERF: pass a *materialized column attribute*, not the split()
    expression — projection collapse inlines an expression argument into
    every element_at() call here (3n per shingle), turning one
    tokenization per row into hundreds. See `llm.dedup._shingle_sets`
    for the exchange-barrier pattern that materializes it."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column. The unit for near-dup
    Jaccard/MinHash: unigram sets saturate on small vocabularies,
    shingles don't. (For hot paths prefer materializing `tokens()`
    first — see `shingles_from_tokens`.)"""
    return shingles_from_tokens(tokens(text), n)


def stopword_count(toks: Column, stopwords=STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*stopwords))).cast("long")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-collapsed, lowercased,
    trimmed text — stable under formatting-only edits."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard per-document quality/statistics columns."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t).cast("long")
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_uniq_tokens", F.size(F.array_distinct(t)).cast("long"))
        .withColumn(
            "ttr", F.size(F.array_distinct(t)) / F.greatest(F.size(t), F.lit(1))
        )
        .withColumn("n_stopwords", stopword_count(t))
        .withColumn(
            "stopword_ratio", stopword_count(t) / F.greatest(n_tok, F.lit(1))
        )
        .withColumn("fingerprint", fingerprint(F.col(text_col)))
    )


@query(
    "text_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
           len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS ttr,
           CAST(len(list_filter(toks,
                x -> x IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords,
           len(list_filter(toks,
                x -> x IN ('the','a','of','and','to','in'))) * 1.0
                 / greatest(len(toks), 1) AS stopword_ratio
    FROM d
    """,
)
def q_text_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars", "text")
    return add_text_stats(docs).drop("text", "fingerprint")


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_word_tokens
    FROM documents
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Fingerprint (rolling-hash stand-in: md5 over canonical form) +
    regex word-token count (the BPE-ish tokenizer count)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        F.size(word_tokens(F.col("text"))).cast("long").alias("n_word_tokens"),
    )


@query(
    "lang_id_heuristic",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
                 x -> x IN ('the','a','of','and','to','in'))) AS n_stop,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n_tok > 0 AND n_stop * 1.0 / n_tok >= 0.05 THEN 'en'
                ELSE 'unk' END AS predicted_lang
    FROM d
    """,
)
def q_lang_id(spark, sf_dir):
    """N-gram/stopword language-ID heuristic: score = stopword density.

    (The synthetic corpus is English-ish regardless of its `lang` label,
    so the interesting property is determinism of the scoring rule, not
    accuracy.)
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n_tok = F.size(t)
    n_stop = stopword_count(t)
    return docs.select(
        "doc_id",
        "lang",
        F.when((n_tok > 0) & (n_stop / n_tok >= 0.05), F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("predicted_lang"),
    )
