"""Deterministic sampling operators for training-data curation.

`rand()`-based sampling can't be oracle-checked and isn't reproducible
across retries of a failed stage — at 100 TB a re-executed task that
re-rolls its sample corrupts the dataset. Both operators here key the
sampling decision on a hash of a stable ID, so any executor, any retry,
any engine (Spark or the DuckDB oracle) picks the identical rows:

- hash-bucket sample: keep rows whose md5(id) bucket < pct. Map-only —
  no shuffle, no state, scales to any size; the sampling rate is exact
  in expectation and each row's fate is a pure function of its id.
- exact stratified sample: ceil(fraction × |stratum|) rows per stratum,
  chosen by md5 order — one window pass per stratum (bounded-key
  shuffle on (lang, source)), used when per-stratum counts must be
  exact, e.g. balancing languages in a training mix.

Reference parity: the reference has no sampler (its `data_faker.py`
generates, never samples); these are north-star training-pipeline ops
per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table


def hash_bucket(col, buckets: int = 100):
    """Deterministic bucket in [0, buckets) from md5 of the column's
    string form — identical in Spark and DuckDB (`conv` ≡ hex CAST)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 4), 16, 10)
        .cast("int") % buckets
    )


def sample_hash_bucket(df: DataFrame, id_col: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, deterministically, with zero shuffle."""
    return df.filter(hash_bucket(id_col) < pct)


def stratified_sample_exact(
    df: DataFrame, strata: list[str], id_col: str, fraction: float
) -> DataFrame:
    """Exactly ceil(fraction × count) rows per stratum, selected by
    md5(id) order (deterministic, uniform over the stratum)."""
    w = Window.partitionBy(*strata).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    cnt = Window.partitionBy(*strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__take", F.ceil(F.count("*").over(cnt) * fraction))
        .filter(F.col("__rn") <= F.col("__take"))
        .drop("__rn", "__take")
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, seed: str, n_shards: int = 16
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: every row gets a
    (shard_id, shard_pos) — which shard file a data loader reads it
    from and its position inside that shard — as a pure function of
    (seed, id). A new seed is a fresh global permutation; the same seed
    replays bit-identically on any engine, any retry.

    Scale shape: the sort key is map-only md5; the only shuffle is the
    per-shard position window, whose parallelism IS n_shards — at
    corpus scale callers size n_shards to the target shard file size
    (e.g. ~256 MB ⇒ hundreds of thousands of shards at 100 TB), so
    each window partition stays small and every core has work. A
    single GLOBAL position (row_number over everything) is deliberately
    not offered: it serializes into one task for no training benefit —
    loaders consume (shard, pos) order, not a global sequence
    (cf. the shard-local `pack_sequences` redesign in llm/text.py).
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    d = df.select(id_col, key.alias("__k")).withColumn(
        "shard_id",
        (F.conv(F.substring("__k", 1, 4), 16, 10).cast("int") % n_shards).cast(
            "long"
        ),
    )
    w = Window.partitionBy("shard_id").orderBy("__k", id_col)
    return d.withColumn("shard_pos", F.row_number().over(w).cast("long")).select(
        id_col, "shard_id", "shard_pos"
    )


# ---------------------------------------------------------------------------
# Catalog entries
# ---------------------------------------------------------------------------


@query(
    "dataset_epoch_shuffle",
    oracle="""
    WITH k AS (
      SELECT doc_id, md5('ep7:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ), s AS (
      SELECT doc_id, k,
             CAST(CAST('0x' || substr(k, 1, 4) AS INTEGER) % 16 AS BIGINT)
               AS shard_id
      FROM k
    )
    SELECT doc_id, shard_id,
           CAST(row_number() OVER (
             PARTITION BY shard_id ORDER BY k, doc_id) AS BIGINT) AS shard_pos
    FROM s
    """,
)
def q_dataset_epoch_shuffle(spark, sf_dir):
    """Epoch 7's deterministic shuffle of the document corpus into 16
    loader shards. Retry-safe and engine-independent: the oracle
    replays the identical permutation from (seed, doc_id) alone."""
    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, "doc_id", "ep7", n_shards=16)


@query(
    "sample_hash_bucket",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
          % 100 < 10
    """,
)
def q_sample_hash_bucket(spark, sf_dir):
    """~10% deterministic document sample — map-only, retry-safe,
    oracle-identical row set."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_hash_bucket(docs, "doc_id", 10).select("doc_id", "lang", "source")


@query(
    "sample_stratified_exact",
    oracle="""
    WITH ranked AS (
      SELECT lang, source, doc_id,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang, source) AS n
      FROM documents
    )
    SELECT lang, source, count(*) AS n_sampled
    FROM ranked WHERE rn <= CAST(ceil(n * 0.2) AS BIGINT)
    GROUP BY lang, source
    """,
)
def q_sample_stratified_exact(spark, sf_dir):
    """Exact 20%-per-(lang, source) stratified sample; emits per-stratum
    sampled counts (the balance sheet a training-mix builder checks)."""
    docs = load_table(spark, sf_dir, "documents")
    s = stratified_sample_exact(docs, ["lang", "source"], "doc_id", 0.2)
    return s.groupBy("lang", "source").agg(F.count("*").alias("n_sampled"))


#: target training-mix weights in per-mille (integer arithmetic end to
#: end — no float rounding to diverge between engines)
MIX_WEIGHTS_PM: dict[str, int] = {"en": 500, "de": 200, "fr": 150, "es": 100, "zh": 50}


@query(
    "dataset_mix",
    oracle="""
    WITH c AS (
      SELECT lang, count(*) AS n_avail FROM documents GROUP BY lang
    ), w AS (
      SELECT * FROM (VALUES ('en', 500), ('de', 200), ('fr', 150),
                            ('es', 100), ('zh', 50)) AS t(lang, w_pm)
    ), j AS (
      SELECT c.lang, n_avail, w_pm FROM c JOIN w USING (lang)
    ), n AS (
      SELECT min(n_avail * 1000 // w_pm) AS cap FROM j
    ), k AS (
      SELECT lang, n_avail, w_pm * cap // 1000 AS n_kept FROM j, n
    )
    SELECT lang, CAST(n_avail AS BIGINT) AS n_avail,
           CAST(n_kept AS BIGINT) AS n_kept,
           CAST(n_kept * 1000 // (SELECT sum(n_kept) FROM k) AS BIGINT) AS mix_pm
    FROM k ORDER BY lang
    """,
)
def q_dataset_mix(spark, sf_dir):
    """Weighted training-mix planner: given target language weights,
    compute the largest total corpus the available documents support
    at exactly those proportions (cap = min over langs of
    n_avail/weight) and the per-language keep quota. Pure integer
    arithmetic (per-mille weights, floor division) so Spark and the
    oracle agree bit-for-bit; the plan is one bounded-key agg (5
    langs) + two scalar cross-joins — nothing scales with corpus
    size except the first count. Row selection against the quota is
    `stratified_sample_exact` (same module); this query is the
    planning half that decides each stratum's take."""
    docs = load_table(spark, sf_dir, "documents")
    wmap = F.create_map(
        *[F.lit(x) for kv in MIX_WEIGHTS_PM.items() for x in kv]
    )
    j = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_avail"))
        .withColumn("w_pm", F.element_at(wmap, F.col("lang")))
        .filter(F.col("w_pm").isNotNull())
    )
    cap = j.agg(F.min(F.expr("n_avail * 1000 div w_pm")).alias("cap"))
    k = j.crossJoin(F.broadcast(cap)).withColumn(
        "n_kept", F.expr("w_pm * cap div 1000")
    )
    tot = k.agg(F.sum("n_kept").alias("tot"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n_avail").cast("bigint").alias("n_avail"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.expr("n_kept * 1000 div tot").cast("bigint").alias("mix_pm"),
        )
        .orderBy("lang")
    )


TOKEN_BUDGET_PER_SOURCE = 1400


def doc_token_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens, bucket) — the per-document frame the
    token-budget sampler operates on; shared with the curation funnel
    (`llm.curate`) so tokenization and bucketing can't drift between
    them. Tokenization is the canonical `llm.text.tokens`."""
    from dynamodb_to_datalake_project_spark.llm.text import tokens

    return docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        hash_bucket("doc_id", 1000).alias("bucket"),
    )


def token_budget_aggregate(d: DataFrame, budget: int) -> DataFrame:
    """Per-source token-budget plan + realized sample over a
    (source, n_tokens, bucket) frame: keep rate = min(1, budget/total
    tokens) in integer per-mille, realization by md5 bucket. Returns
    (source, total_tokens, rate_pm, n_docs, n_sampled, sampled_tokens).

    One bounded-key agg for totals, the rate table broadcast back,
    one conditional bounded-key agg — the corpus never wide-shuffles."""
    rates = (
        d.groupBy("source")
        .agg(F.sum("n_tokens").alias("total_tokens"))
        .withColumn(
            "rate_pm",
            F.least(F.lit(1000), F.expr(f"{budget} * 1000 div total_tokens")),
        )
    )
    kept = F.col("bucket") < F.col("rate_pm")
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "total_tokens", "rate_pm")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count(F.when(kept, F.lit(1))).cast("long").alias("n_sampled"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("sampled_tokens"),
        )
        .select(
            "source",
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("rate_pm").cast("long").alias("rate_pm"),
            "n_docs",
            "n_sampled",
            "sampled_tokens",
        )
    )


@query(
    "dataset_token_budget_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
               % 1000 AS bucket
      FROM documents
    ), tot AS (
      SELECT source, sum(n_tokens) AS total_tokens FROM d GROUP BY source
    ), r AS (
      SELECT source, total_tokens,
             least(1000, 1400 * 1000 // total_tokens) AS rate_pm
      FROM tot
    )
    SELECT d.source,
           CAST(r.total_tokens AS BIGINT) AS total_tokens,
           CAST(r.rate_pm AS BIGINT) AS rate_pm,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE d.bucket < r.rate_pm) AS BIGINT)
             AS n_sampled,
           CAST(coalesce(sum(d.n_tokens) FILTER (WHERE d.bucket < r.rate_pm), 0)
                AS BIGINT) AS sampled_tokens
    FROM d JOIN r USING (source)
    GROUP BY d.source, r.total_tokens, r.rate_pm ORDER BY d.source
    """,
)
def q_dataset_token_budget_sample(spark, sf_dir):
    """Token-budget-constrained corpus sampling — the down-sampling
    step real pretraining mixes run (budgets are set in TOKENS, not
    document counts): each source gets a deterministic per-mille keep
    rate = min(1, budget / its total tokens), and documents are kept
    by md5-bucket against that rate (`hash_bucket` — retry-stable, no
    RNG). Output is the per-source plan AND the realized sample in one
    frame: totals, rate, and sampled doc/token counts. Pure integer
    arithmetic end to end.

    Plan: map-only token counts -> one bounded-key agg (20 sources)
    -> 20-row rate table broadcast back onto the corpus -> conditional
    agg on the same bounded key. The corpus itself never wide-shuffles;
    at 100 TB both aggregations are map-side-combined counts."""
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_aggregate(
        doc_token_frame(docs), TOKEN_BUDGET_PER_SOURCE
    ).orderBy("source")


@query(
    "cluster_balanced_sample",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8
    ), d AS (
      SELECT e.vec_id, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
                      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d2
      FROM e, c
    ), a AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM d
    ), r AS (
      SELECT vec_id, cid AS centroid_id,
             row_number() OVER (
               PARTITION BY cid
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rnk
      FROM a WHERE rn = 1
    )
    SELECT vec_id, centroid_id, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 20
    ORDER BY centroid_id, rnk
    """,
)
def q_cluster_balanced_sample(spark, sf_dir):
    """Cluster-balanced (diversity) sampling: every embedding routes to
    its nearest seed centroid (the deterministic vec_id<8 seeding and
    strict-< tie rule of `embed_centroid_assign`, whose oracle is
    driver-green) and each cluster contributes an EQUAL quota of 20
    vectors chosen by md5-rank — the "spread the training mix across
    semantic space" sampler that prevents one dense cluster from
    dominating a curated set.

    Scale shape: assignment is map-only (broadcast literal codebook,
    sequential-fold argmin — the corpus never shuffles to be
    assigned); quota selection uses the salted two-phase top-k
    (`dedup.salted_top_k_per_key`): with 8 clusters a plain window
    would collapse the selection into 8 tasks, so phase 1 ranks
    within (cluster, salt) at full parallelism and phase 2 re-ranks
    only the <= n_salts*20 survivors per cluster. md5-rank keeps the
    choice retry-stable and oracle-replayable (no rand())."""
    from dynamodb_to_datalake_project_spark.dedup import salted_top_k_per_key
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        as_double_vec,
        assign_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"),
        as_double_vec(F.col("embedding")).alias("cv"),
    )
    assigned = assign_centroids(emb, cents).select("vec_id", "centroid_id")
    picked = salted_top_k_per_key(
        assigned,
        ["centroid_id"],
        [F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()],
        k=20,
    )
    return picked.select(
        "vec_id", "centroid_id", F.col("rnk").cast("long").alias("rnk")
    ).orderBy("centroid_id", "rnk")


def weighted_sample_aes(
    df: DataFrame, id_col: str, weight_col, k: int
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of k rows, where each
    row's inclusion probability is proportional to its weight — the
    Efraimidis-Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006):
    draw u_i ~ U(0,1], rank by u_i^(1/w_i), keep the top k. We rank by
    the monotone-equivalent log-key ln(u_i)/w_i (descending) to avoid
    pow() underflow at large weights.

    Determinism: u_i is NOT rand() — it is derived from md5(id)
    (60 bits → (h+1)/2^60 ∈ (0,1]), so any executor, any retry of a
    failed stage, and the DuckDB oracle all draw the identical sample.
    At 100 TB a task retry that re-rolled rand() would silently
    corrupt the sample's distribution; a pure function of the row id
    cannot.

    Scale shape: the key is map-only (md5 + one ln per row, no
    shuffle); `orderBy(...).limit(k)` compiles to
    TakeOrderedAndProject — a per-partition k-heap plus a k-row
    driver merge, never a global sort. Cost is one scan + O(k) per
    partition regardless of corpus size.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    pr = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("__pr", pr)
        .orderBy(F.col("__pr").desc(), F.col(id_col))
        .limit(k)
        .drop("__pr")
    )


@query(
    "sample_weighted_aes",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, source, n_chars,
             ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                      AS BIGINT) AS DOUBLE) + 1.0)
                / 1152921504606846976.0)
             / CAST(n_chars AS DOUBLE) AS pr
      FROM documents
      ORDER BY pr DESC, doc_id
      LIMIT 200
    )
    """,
)
def q_sample_weighted_aes(spark, sf_dir):
    """Length-weighted 200-document sample (A-ES): longer documents are
    proportionally more likely to be drawn — the standard way to
    sample a token-budget-representative subset rather than a
    doc-count-representative one. Both engines derive the SAME
    uniform from md5(doc_id) and rank by ln(u)/n_chars, so the
    selected row set is identical (the float key itself is dropped
    from the output; only ordering consumes it)."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_aes(docs, "doc_id", "n_chars", 200).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "dataset_mix_temperature",
    oracle="""
    WITH c AS (
      SELECT lang, count(*) AS n_avail FROM documents GROUP BY lang
    ), s AS (
      SELECT lang, n_avail,
             CAST(floor(sqrt(n_avail)) AS BIGINT) AS score
      FROM c
    ), tot AS (
      SELECT sum(score) AS score_sum, sum(n_avail) // 2 AS budget FROM s
    )
    SELECT lang,
           CAST(n_avail AS BIGINT) AS n_avail,
           score,
           CAST(LEAST(n_avail, budget * score // score_sum) AS BIGINT)
             AS n_kept,
           CAST(score * 1000 // score_sum AS BIGINT) AS mix_pm
    FROM s, tot ORDER BY lang
    """,
)
def q_dataset_mix_temperature(spark, sf_dir):
    """Temperature-scaled training mix (the multilingual sampling rule
    p_i ∝ q_i^α with α = 0.5 — upweights tail languages relative to
    proportional sampling): per-language score = isqrt(n_avail)
    (IEEE sqrt + floor is exact for any corpus count), half-corpus
    budget split by integer score share, capped at availability.
    Pure integer outputs, so Spark and DuckDB agree bit-for-bit; one
    bounded-key agg + one scalar cross-join — nothing scales with the
    corpus except the count."""
    from dynamodb_to_datalake_project_spark.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n_avail"))
    s = c.withColumn(
        "score", F.floor(F.sqrt(F.col("n_avail"))).cast("long")
    )
    tot = s.agg(
        F.sum("score").alias("score_sum"),
        (F.sum("n_avail") / 2).cast("long").alias("budget"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n_avail").cast("long").alias("n_avail"),
            "score",
            F.least(
                F.col("n_avail").cast("long"),
                # integer `div` (not double / + cast): a double quotient
                # that lands a hair under an exact integer would
                # truncate differently than DuckDB's // floor
                F.expr("budget * score div score_sum"),
            ).alias("n_kept"),
            F.expr("score * 1000 div score_sum").alias("mix_pm"),
        )
        .orderBy("lang")
    )
