"""End-to-end corpus curation capstone: the full training-data funnel
as ONE composed Spark plan.

quality gate → exact dedup → near-dup prune (`clean_corpus`) →
benchmark decontamination (`decontaminate`) → token-budget sampling
(per-source md5-bucket rates) → per-source funnel report.

Every stage is an operator proven individually elsewhere in the
catalog (corpus_clean, decontaminate_ngrams, dataset_token_budget_
sample); this query proves they COMPOSE — the shape a real
pretraining-data job takes, raw corpus in, training-ready sample
stats out. The one materialization point is deliberate: the cleaned
survivors feed three downstream branches, so they are staged once
(localCheckpoint) instead of recomputing the dedup pipeline per
branch; everything downstream of that point is a single composed
plan. The oracle rebuilds the same funnel as DuckDB CTEs, so a
drift anywhere in the chain fails the hash.

Scale: inherits each stage's discipline — capped Jaccard blocks,
broadcast benchmark side, bounded-key (20-source) aggregations,
map-only sampling. Nothing new shuffles; the funnel report itself
is three tiny source-level aggs joined broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.sampling import (
    TOKEN_BUDGET_PER_SOURCE,
    doc_token_frame,
    token_budget_aggregate,
)


@query(
    "corpus_curate_full",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), quality AS (
      SELECT * FROM toks WHERE len(tk) >= 10
    ), exact_keep AS (
      SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
    ), survivors AS (
      SELECT q.* FROM quality q JOIN exact_keep k ON q.doc_id = k.doc_id
    ), sh AS (
      SELECT doc_id, substr(text, 1, 32) AS blk,
             CASE WHEN len(tk) >= 3
                  THEN list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                  ELSE [array_to_string(tk, ' ')] END AS w
      FROM survivors
    ), neardrop AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.w, b.w)) * 1.0
            / len(list_distinct(list_concat(a.w, b.w))) >= 0.8
    ), clean AS (
      SELECT s.* FROM survivors s
      WHERE s.doc_id NOT IN (SELECT doc_id FROM neardrop)
        AND s.source <> 'src0'
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], ' ')
             ))) AS ngram
      FROM clean WHERE len(tk) >= 4
    ), bench AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], ' ')
             ))) AS ngram
      FROM toks WHERE source = 'src0' AND len(tk) >= 4
    ), contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (ngram)
    ), decon AS (
      SELECT c.doc_id, c.source, CAST(len(c.tk) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 4)
                  AS INTEGER) % 1000 AS bucket
      FROM clean c
      WHERE c.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), rates AS (
      SELECT source, sum(n_tokens) AS total_tokens,
             least(1000, 1400 * 1000 // sum(n_tokens)) AS rate_pm
      FROM decon GROUP BY source
    ), inp AS (
      SELECT source, count(*) AS n_input FROM documents
      WHERE source <> 'src0' GROUP BY source
    ), cl AS (
      SELECT source, count(*) AS n_clean FROM clean GROUP BY source
    )
    SELECT d.source,
           CAST(inp.n_input AS BIGINT) AS n_input,
           CAST(cl.n_clean AS BIGINT) AS n_clean,
           CAST(count(*) AS BIGINT) AS n_decontaminated,
           CAST(r.total_tokens AS BIGINT) AS total_tokens,
           CAST(r.rate_pm AS BIGINT) AS rate_pm,
           CAST(count(*) FILTER (WHERE d.bucket < r.rate_pm) AS BIGINT)
             AS n_sampled,
           CAST(coalesce(sum(d.n_tokens) FILTER (WHERE d.bucket < r.rate_pm), 0)
                AS BIGINT) AS sampled_tokens
    FROM decon d
    JOIN rates r USING (source)
    JOIN inp USING (source) JOIN cl USING (source)
    GROUP BY d.source, inp.n_input, cl.n_clean, r.total_tokens, r.rate_pm
    ORDER BY d.source
    """,
)
def q_corpus_curate_full(spark, sf_dir):
    """The full curation funnel as one composed plan; see module
    docstring. Reports per source: input docs, docs after
    clean_corpus (quality + exact dedup + near-dup prune, benchmark
    source excluded), docs after decontamination, token totals, the
    integer per-mille sampling rate against the token budget, and the
    realized sample's doc/token counts."""
    from dynamodb_to_datalake_project_spark.llm.decontam import decontaminate
    from dynamodb_to_datalake_project_spark.llm.dedup import clean_corpus

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")

    # The cleaned-survivor frame feeds THREE branches (decontaminate's
    # train side, the sampling frame, the n_clean report agg), and
    # clean_corpus is the funnel's most expensive stage (quality gate +
    # exact dedup + blocked near-dup Jaccard). Unlike the cheap
    # distinct in source_overlap_matrix — where staging only pays off
    # past a size threshold — recomputing THIS pipeline per branch
    # loses at every scale (A/B at sf0.1: staged ~4.5 s vs lazy
    # ~6.9 s steady-state; at 100 TB it is 3x the dominant cost), so
    # the materialization is unconditional. localCheckpoint stores to
    # block manager (memory, disk-spill) — the Spark-native "stage to
    # temp table once" form.
    surv = clean_corpus(docs).localCheckpoint(eager=True)
    train = surv.filter(F.col("source") != "src0")
    contaminated = decontaminate(train, bench, "doc_id", "text", n=4).select(
        "doc_id"
    )
    # sampling stage = the SAME helper pair as dataset_token_budget_
    # sample, so tokenization, bucketing, and rate arithmetic cannot
    # drift between the standalone sampler and this funnel
    decon = doc_token_frame(train.join(contaminated, "doc_id", "left_anti"))
    stats = token_budget_aggregate(decon, TOKEN_BUDGET_PER_SOURCE)

    n_input = (
        docs.filter(F.col("source") != "src0")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_input"))
    )
    n_clean = train.groupBy("source").agg(
        F.count("*").cast("long").alias("n_clean")
    )
    return (
        stats.withColumnRenamed("n_docs", "n_decontaminated")
        .join(F.broadcast(n_input), "source")
        .join(F.broadcast(n_clean), "source")
        .select(
            "source",
            "n_input",
            "n_clean",
            "n_decontaminated",
            "total_tokens",
            "rate_pm",
            "n_sampled",
            "sampled_tokens",
        )
        .orderBy("source")
    )
