"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap, scaled here to 4-grams for the short synthetic docs):
any training document that shares at least one distinct n-gram with the
benchmark is contaminated and reported with its overlap count.

Scale shape: both sides reduce to DISTINCT n-grams before the join —
the train side per-document (array_distinct inside the row, before the
explode, so duplicate shingles never hit the shuffle), the benchmark
side globally. The join is a plain equi-join on the n-gram string;
benchmark n-gram sets are small (benchmarks are thousands of docs, not
billions) so AQE converts it to a broadcast at runtime — no forced
broadcast hint (an unbounded hint OOMs if someone passes a huge
"benchmark"). One shuffle keyed by doc_id aggregates overlap counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.llm.text import tokens


def doc_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, ngram) with per-document DISTINCT word n-grams; documents
    shorter than n tokens emit nothing."""
    tk = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk")).filter(
        F.size("__tk") >= n
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("__tk", i, n)),
        )
    )
    return tk.select(id_col, F.explode(grams).alias("ngram"))


def decontaminate(
    train: DataFrame, benchmark: DataFrame, id_col: str, text_col: str, n: int = 4
) -> DataFrame:
    """(id, n_shared) for every training doc sharing ≥1 distinct
    n-gram with the benchmark corpus."""
    train_g = doc_ngrams(train, id_col, text_col, n)
    bench_g = doc_ngrams(benchmark, id_col, text_col, n).select("ngram").distinct()
    return (
        train_g.join(bench_g, "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


@query(
    "decontaminate_ngrams",
    oracle="""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], ' ')
             ))) AS ngram
      FROM tk WHERE len(tk) >= 4
    ), bench AS (
      SELECT DISTINCT ngram FROM g WHERE source = 'src0'
    )
    SELECT g.doc_id, count(*) AS n_shared
    FROM g JOIN bench USING (ngram)
    WHERE g.source <> 'src0'
    GROUP BY g.doc_id
    """,
)
def q_decontaminate(spark, sf_dir):
    """Decontamination sweep: `src0` documents stand in for the
    benchmark; every other document is reported with its count of
    distinct 4-grams that also occur anywhere in the benchmark."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return decontaminate(train, bench, "doc_id", "text", n=4)
