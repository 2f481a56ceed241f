"""Statistical language-model scoring over document corpora: add-k
bigram-LM perplexity (the CCNet/ccnet-style quality signal) and a
Naive-Bayes text classifier trained and applied distributed.

Both operators follow the same 100 TB shape: the MODEL is a
vocab-bounded count table (unigrams/bigrams/class-conditional token
counts — megabytes to low gigabytes, never corpus-sized) built with
map-side-combinable aggregations, and SCORING is one equi-join of the
per-doc token frame against that table plus a per-doc aggregation.
No Python UDFs anywhere — the whole path is whole-stage-codegen
column expressions; the count-table joins are broadcast-upgraded by
AQE when the observed vocabulary is small.

Float discipline (driver hashes values): ln() of integer-derived
doubles is bit-identical across Spark and DuckDB (same libm inputs);
only the per-doc SUM of those terms is accumulation-order-dependent,
so every emitted float is rounded to 6 digits on both sides — the
same convention as the cosine/PCA queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.llm.text import tokens

#: add-k smoothing constant for the bigram LM
LM_K = 0.5


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, bigram, m) — adjacent-token pairs per doc WITH
    multiplicity (LM statistics count occurrences; dedup shingles
    don't). One projection + one combinable count."""
    t = docs.select(
        "doc_id", tokens(F.col(text_col)).alias("tk")
    ).filter(F.size("tk") >= 2)
    return (
        t.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("tk", i), F.element_at("tk", i + 1)
                    ),
                )
            ).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("m"))
    )


def lm_score_docs(docs: DataFrame, k: float = LM_K) -> DataFrame:
    """Per-doc average negative log-likelihood under an add-k-smoothed
    bigram LM trained on the same corpus:

        P(y|x) = (c_xy + k) / (c_x + k*V)

    where c_xy is the corpus bigram count, c_x the count of x as a
    bigram LEFT context (= sum_y c_xy), and V the unigram vocabulary
    size. High avg_nll = surprising/low-quality text — the filter
    signal perplexity-based curation thresholds on.

    Plan (train → materialize → score, the natural pipeline
    boundary): ONE corpus pass builds the bigram count table; the
    context count c_x is a window over that vocab-bounded table (NOT
    a second corpus aggregation), and the finished model — megabytes
    — is materialized with `localCheckpoint` so the scoring join's
    build side doesn't re-run the corpus pipeline (Spark recomputes
    un-materialized lineage per plan branch; a production run writes
    the model to a table here). The doc-bigram frame is ALSO staged
    once (see the in-code note), so scoring reads stored rows joined
    against the materialized model — AQE broadcast-upgrades it when
    the observed vocabulary is small.
    """
    from pyspark.sql import Window

    # bd is consumed by TWO separate jobs (the model checkpoint and
    # the scoring join), and cross-job plans share no exchanges — the
    # tokenize + bigram-explode + per-doc aggregation used to run
    # twice. Staging it once (the curate.py "stage to temp table"
    # form; block store spills to disk at scale) makes both consumers
    # read stored rows, trading one write of the doc-bigram table for
    # a full second corpus tokenization pass.
    bd = doc_bigrams(docs).localCheckpoint(eager=True)
    model = (
        bd.groupBy("bigram")
        .agg(F.sum("m").alias("c_xy"))
        .withColumn("x", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("c_x", F.sum("c_xy").over(Window.partitionBy("x")))
        .drop("x")
        .localCheckpoint(eager=True)
    )
    vocab = docs.select(
        F.explode(tokens(F.col("text"))).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    scored = bd.join(model, "bigram").crossJoin(F.broadcast(vocab))
    nll_term = F.col("m") * (
        F.log(F.col("c_x") + F.lit(k) * F.col("v"))
        - F.log(F.col("c_xy") + F.lit(k))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.round(F.sum(nll_term) / F.sum("m"), 6).alias("avg_nll"),
        )
    )


_LM_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), bd AS (
      SELECT doc_id, bigram, count(*) AS m FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1])) AS bigram
        FROM t WHERE len(tk) >= 2
      ) GROUP BY doc_id, bigram
    ), gb AS (
      SELECT bigram, sum(m) AS c_xy FROM bd GROUP BY bigram
    ), lft AS (
      SELECT string_split(bigram, ' ')[1] AS x, sum(c_xy) AS c_x
      FROM gb GROUP BY x
    ), vocab AS (
      SELECT count(DISTINCT w) AS v
      FROM (SELECT unnest(tk) AS w FROM t)
    )
    SELECT bd.doc_id,
           CAST(sum(bd.m) AS BIGINT) AS n_bigrams,
           round(sum(bd.m * (ln(lft.c_x + {LM_K} * vocab.v)
                             - ln(gb.c_xy + {LM_K}))) / sum(bd.m),
                 6) AS avg_nll
    FROM bd
    JOIN gb USING (bigram)
    JOIN lft ON lft.x = string_split(bd.bigram, ' ')[1]
    CROSS JOIN vocab
    GROUP BY bd.doc_id
    """


@query("lm_perplexity_score", oracle=_LM_ORACLE)
def q_lm_perplexity_score(spark, sf_dir):
    """Bigram-LM perplexity quality scoring of the documents corpus
    (train + score in one plan). Every doc with >= 2 tokens gets
    (n_bigrams, avg_nll); downstream curation thresholds on avg_nll
    exactly like `text_quality_filter` thresholds on surface stats."""
    return lm_score_docs(load_table(spark, sf_dir, "documents"))


def nb_train_score(
    docs: DataFrame, pos_pred, k: float = 1.0
) -> DataFrame:
    """Multinomial Naive Bayes trained on a weak label predicate and
    applied back over the corpus, all in one distributed plan.

    `pos_pred`: a boolean Column over `docs` rows supplying the weak
    label (here: is the doc English — the shape of a fasttext-style
    quality/language classifier whose training labels come from a
    heuristic). The MODEL is the class-conditional token count table
    (vocab-bounded) plus five scalars (class token totals, doc
    priors, vocabulary size); scoring is one join + one per-doc fold:

        logodds(d) = sum_w m_w * (ln(c_pos_w + k) - ln(c_neg_w + k))
                   + n_d * (ln(N_neg + kV) - ln(N_pos + kV))
                   + ln(D_pos) - ln(D_neg)
    """
    tok = (
        docs.select(
            "doc_id",
            pos_pred.alias("is_pos"),
            F.explode(tokens(F.col("text"))).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("m"), F.first("is_pos").alias("is_pos"))
    )
    # The MODEL: vocab-bounded class-conditional counts, built in one
    # corpus pass and materialized (localCheckpoint) so neither the
    # scalar reduction nor the scoring join re-runs the corpus
    # pipeline (a production run writes this table out here).
    cls = (
        tok.groupBy("w")
        .agg(
            F.sum(F.when(F.col("is_pos"), F.col("m")).otherwise(0)).alias("c_pos"),
            F.sum(F.when(~F.col("is_pos"), F.col("m")).otherwise(0)).alias("c_neg"),
        )
        .localCheckpoint(eager=True)
    )
    # Class token totals + vocab size reduce over the small model
    # table; doc priors come from a LIGHT corpus scan (no explode, no
    # agg shuffle — docs with at least one token, per class, exactly
    # the doc set `tok` would yield).
    totals = cls.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count("*").alias("v"),
    )
    priors = docs.filter(F.size(tokens(F.col("text"))) >= 1).agg(
        F.sum(F.when(pos_pred, 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(~pos_pred, 1).otherwise(0)).alias("d_neg"),
    )
    scalars = totals.crossJoin(priors)
    scored = tok.join(cls, "w").crossJoin(F.broadcast(scalars))
    term = F.col("m") * (
        F.log(F.col("c_pos") + F.lit(k)) - F.log(F.col("c_neg") + F.lit(k))
    )
    prior = (
        F.log(F.col("d_pos").cast("double"))
        - F.log(F.col("d_neg").cast("double"))
    )
    length_norm = F.sum("m") * (
        F.log(F.first("n_neg") + F.lit(k) * F.first("v"))
        - F.log(F.first("n_pos") + F.lit(k) * F.first("v"))
    )
    out = scored.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_tokens"),
        (F.sum(term) + length_norm + F.first(prior)).alias("_score"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("_score", 6).alias("nb_logodds"),
        (F.col("_score") > 0).alias("pred_pos"),
    )


_NB_ORACLE = """
    WITH tok AS (
      SELECT doc_id, (lang = 'en') AS is_pos, w, count(*) AS m FROM (
        SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS w
        FROM documents
      ) GROUP BY doc_id, is_pos, w
    ), cls AS (
      SELECT w,
             sum(CASE WHEN is_pos THEN m ELSE 0 END) AS c_pos,
             sum(CASE WHEN NOT is_pos THEN m ELSE 0 END) AS c_neg
      FROM tok GROUP BY w
    ), s AS (
      SELECT sum(CASE WHEN is_pos THEN m ELSE 0 END) AS n_pos,
             sum(CASE WHEN NOT is_pos THEN m ELSE 0 END) AS n_neg,
             count(DISTINCT w) AS v,
             count(DISTINCT CASE WHEN is_pos THEN doc_id END) AS d_pos,
             count(DISTINCT CASE WHEN NOT is_pos THEN doc_id END) AS d_neg
      FROM tok
    ), agg AS (
      SELECT tok.doc_id,
             CAST(sum(tok.m) AS BIGINT) AS n_tokens,
             sum(tok.m * (ln(cls.c_pos + 1.0) - ln(cls.c_neg + 1.0)))
               + sum(tok.m) * (ln(any_value(s.n_neg) + 1.0 * any_value(s.v))
                               - ln(any_value(s.n_pos) + 1.0 * any_value(s.v)))
               + ln(CAST(any_value(s.d_pos) AS DOUBLE))
               - ln(CAST(any_value(s.d_neg) AS DOUBLE)) AS score
      FROM tok JOIN cls USING (w) CROSS JOIN s
      GROUP BY tok.doc_id
    )
    SELECT doc_id, n_tokens, round(score, 6) AS nb_logodds,
           score > 0 AS pred_pos
    FROM agg
    """


@query("quality_nb_score", oracle=_NB_ORACLE)
def q_quality_nb_score(spark, sf_dir):
    """Naive-Bayes English-vs-rest classifier: trained on the corpus's
    own `lang` weak labels and applied back to every doc — the
    distributed train-then-apply loop of a model-based quality
    filter, with the model as a bounded count table (never a
    driver-side fit)."""
    docs = load_table(spark, sf_dir, "documents")
    return nb_train_score(docs, F.col("lang") == "en")


_KL_ORACLE = """
    WITH tok AS (
      SELECT source, w, count(*) AS c_sw FROM (
        SELECT source, unnest(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS w
        FROM documents
      ) GROUP BY source, w
    ), per_src AS (
      SELECT source, sum(c_sw) AS n_s FROM tok GROUP BY source
    ), per_w AS (
      SELECT w, sum(c_sw) AS c_w FROM tok GROUP BY w
    ), tot AS (
      SELECT sum(c_sw) AS n FROM tok
    )
    SELECT tok.source,
           CAST(any_value(per_src.n_s) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           round(sum((CAST(tok.c_sw AS DOUBLE) / per_src.n_s)
                     * ln((CAST(tok.c_sw AS DOUBLE) * tot.n)
                          / (CAST(per_src.n_s AS DOUBLE) * per_w.c_w))),
                 6) AS kl_nats
    FROM tok
    JOIN per_src USING (source)
    JOIN per_w USING (w)
    CROSS JOIN tot
    GROUP BY tok.source
    ORDER BY tok.source
    """


@query("source_unigram_kl", oracle=_KL_ORACLE)
def q_source_unigram_kl(spark, sf_dir):
    """Per-source KL divergence of the unigram token distribution from
    the corpus-wide distribution — the data-mix drift diagnostic: a
    source whose KL jumps between snapshots changed character (new
    crawl seed, new boilerplate, encoding regression) and should be
    inspected before it enters a training mix.

    Same train/score shape as the LM scorer: ONE corpus pass builds
    the (source, token) count table — bounded by vocab × n_sources,
    not corpus rows — which is materialized once
    (`localCheckpoint`) and then re-derived three ways (per-source
    totals, per-token totals, grand total) without touching the
    corpus again; the KL sum is a bounded-key aggregation over that
    table joined to its own marginals. Every ln() input is a ratio
    of exact integer counts (cast to double BEFORE multiplying so
    1e19-scale products can't overflow int64 at 100 TB); only the
    per-source sum is order-dependent, handled by the 6-digit
    rounding convention."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c_sw"))
        .localCheckpoint(eager=True)
    )
    per_src = tok.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    per_w = tok.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    tot = tok.agg(F.sum("c_sw").alias("n"))
    term = (F.col("c_sw").cast("double") / F.col("n_s")) * F.log(
        (F.col("c_sw").cast("double") * F.col("n"))
        / (F.col("n_s").cast("double") * F.col("c_w"))
    )
    return (
        tok.join(F.broadcast(per_src), "source")
        .join(per_w, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.first("n_s").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("vocab_size"),
            F.round(F.sum(term), 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM — the KenLM-family smoothing the
# CCNet quality pipeline actually ships (add-k above is the teaching
# baseline; KN's continuation probability is what separates "rare but
# well-formed" from "malformed" text). Absolute discount D = 3/4.
# ---------------------------------------------------------------------------


def kn_score_docs(docs: DataFrame) -> DataFrame:
    """Per-doc average negative log-likelihood under an interpolated
    Kneser-Ney bigram LM trained on the same corpus:

        P_KN(y|x) = (max(c_xy - D, 0) + D·N1+(x·)·P_cont(y)) / c_x
        P_cont(y) = N1+(·y) / N1+(··),   D = 3/4

    With D = 3/4 the probability is a ratio of INTEGERS multiplied
    through by 4·N1+(··):

        num = max(4·c_xy - 3, 0)·N1+(··) + 3·N1+(x·)·N1+(·y)
        den = 4·c_x·N1+(··)

    so every ln() argument is an integer-derived double — bit-
    identical across engines (the module's float discipline); only
    the per-doc sum is order-dependent and lands rounded to 6.

    Plan shape matches `lm_score_docs`: ONE corpus pass builds the
    bigram table; c_x and N1+(x·) are windows over that vocab-bounded
    table, N1+(·y) one more vocab-bounded agg, N1+(··) a scalar; the
    finished model localCheckpoints (megabytes) and scoring is one
    equi-join + per-doc agg. Counts stay inside int64 for any corpus
    where c_xy·N1+(··) < 2^63 — beyond that, promote to DECIMAL."""
    from pyspark.sql import Window

    # staged once for the same two-consumer reason as `lm_score_docs`
    bd = doc_bigrams(docs).localCheckpoint(eager=True)
    gb = (
        bd.groupBy("bigram")
        .agg(F.sum("m").alias("c_xy"))
        .withColumn("x", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("y", F.split(F.col("bigram"), " ").getItem(1))
    )
    wx = Window.partitionBy("x")
    model = (
        gb.withColumn("c_x", F.sum("c_xy").over(wx))
        .withColumn("n1p_fx", F.count("*").over(wx))
        .localCheckpoint(eager=True)
    )
    n1p_pw = model.groupBy("y").agg(F.count("*").alias("n1p_pw"))
    n1p_all = model.agg(F.count("*").alias("n1p_all"))
    full = (
        model.join(n1p_pw, "y")
        .crossJoin(F.broadcast(n1p_all))
        .select(
            "bigram",
            (
                F.greatest(4 * F.col("c_xy") - 3, F.lit(0))
                * F.col("n1p_all")
                + 3 * F.col("n1p_fx") * F.col("n1p_pw")
            ).alias("num"),
            (4 * F.col("c_x") * F.col("n1p_all")).alias("den"),
        )
    )
    scored = bd.join(full, "bigram")
    nll_term = F.col("m") * (F.log(F.col("den")) - F.log(F.col("num")))
    return scored.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.round(F.sum(nll_term) / F.sum("m"), 6).alias("avg_nll"),
    )


_KN_ORACLE = """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), bd AS (
      SELECT doc_id, bigram, count(*) AS m FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1])) AS bigram
        FROM t WHERE len(tk) >= 2
      ) GROUP BY doc_id, bigram
    ), gb AS (
      SELECT bigram, sum(m) AS c_xy,
             string_split(bigram, ' ')[1] AS x,
             string_split(bigram, ' ')[2] AS y
      FROM bd GROUP BY ALL
    ), ctx AS (
      SELECT x, sum(c_xy) AS c_x, count(*) AS n1p_fx FROM gb GROUP BY x
    ), pw AS (
      SELECT y, count(*) AS n1p_pw FROM gb GROUP BY y
    ), tot AS (
      SELECT count(*) AS n1p_all FROM gb
    )
    SELECT bd.doc_id,
           CAST(sum(bd.m) AS BIGINT) AS n_bigrams,
           round(sum(bd.m * (ln(4 * ctx.c_x * tot.n1p_all)
                             - ln(greatest(4 * gb.c_xy - 3, 0) * tot.n1p_all
                                  + 3 * ctx.n1p_fx * pw.n1p_pw)))
                 / sum(bd.m), 6) AS avg_nll
    FROM bd
    JOIN gb USING (bigram)
    JOIN ctx ON ctx.x = gb.x
    JOIN pw ON pw.y = gb.y
    CROSS JOIN tot
    GROUP BY bd.doc_id
    """


@query("lm_kneser_ney_score", oracle=_KN_ORACLE)
def q_lm_kneser_ney_score(spark, sf_dir):
    """Interpolated Kneser-Ney perplexity scoring of the documents
    corpus (train + score in one plan) — the production-grade
    companion to `lm_perplexity_score`: same pipeline shape, KN
    continuation smoothing, every log argument integer-exact."""
    return kn_score_docs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing — the published head/middle/tail split:
# per language, rank documents by LM perplexity and cut into tertiles;
# "head" trains first, "tail" is usually dropped or down-weighted.
# ---------------------------------------------------------------------------


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """Per-language head/middle/tail tertiles over the add-k bigram
    NLL from `lm_score_docs`. The rank orders on the ROUNDED avg_nll
    (deterministic across engines) with doc_id tie-break; one extra
    window over the scored frame — no new corpus pass."""
    from pyspark.sql import Window

    scored = lm_score_docs(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_nll").asc(), F.col("doc_id").asc()
    )
    tert = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "avg_nll",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tert
        ).alias("bucket"),
    )


@query(
    "lm_perplexity_buckets",
    oracle=f"""
    WITH scored AS (
      {_LM_ORACLE}
    )
    SELECT s.doc_id, d.lang, s.avg_nll,
           ['head', 'middle', 'tail'][
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.avg_nll ASC, s.doc_id ASC)] AS bucket
    FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    """,
)
def q_lm_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail: per-language perplexity tertiles over
    the documents corpus. The oracle replays the full LM scoring AND
    the tertile window — deterministic because the rank key is the
    6-rounded avg_nll with doc_id tie-break."""
    return perplexity_buckets(load_table(spark, sf_dir, "documents"))
