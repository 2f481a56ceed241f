"""Frequency-sketch operators: distributed heavy hitters.

The pattern: a cheap per-partition SKETCH pass bounds the candidate
set, then one EXACT pass over the data verifies candidates — so the
result is exact (oracle-checkable) while every shuffle stays bounded
by the sketch size, never by the vocabulary.

Reference parity: the reference has no frequency analytics at all
(its Athena layer is COUNT/SELECT previews, dynamodb_to_datalake/
athena.py); this is north-star corpus tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.llm.text import tokens


def _misra_gries_partial(k: int, value_col: str):
    """mapInPandas op: one Misra-Gries(k) summary per Arrow batch
    stream (i.e. per partition), emitting surviving (item, est) pairs.

    Guarantee used downstream: an item with partition frequency
    > n_p / k survives the partition's summary."""
    import pandas as pd

    def op(batches):
        counters: dict[str, int] = {}
        n_seen = 0
        for pdf in batches:
            # Drop nulls BEFORE counting: value_counts() skips NaN/None
            # while len(pdf) would count them, inflating N; and NULL is
            # reserved as the partition-count sentinel row below. Null
            # items are excluded from the frequency universe.
            pdf = pdf[pdf[value_col].notna()]
            n_seen += len(pdf)
            for v, c in pdf[value_col].value_counts().items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    # weighted MG step: decrement everything (incoming
                    # included) by the smallest involved count; zeros
                    # drop, any remaining incoming weight takes the
                    # freed slot. Each discarded unit of incoming
                    # weight pairs with k counter units, so total
                    # decrement ≤ n_p/(k+1) — the survival guarantee.
                    dec = min(min(counters.values()), c)
                    c -= dec
                    counters = {
                        i: n - dec for i, n in counters.items() if n > dec
                    }
                    if c > 0 and len(counters) < k:
                        counters[v] = c
        # NULL-item row carries the partition's exact row count so the
        # caller gets N from the same single pass
        yield pd.DataFrame(
            {
                "item": list(counters) + [None],
                "est": list(counters.values()) + [n_seen],
            }
        )

    return op


def heavy_hitters(
    items: DataFrame, value_col: str, phi: float, k: int | None = None
) -> DataFrame:
    """EXACT items with frequency > phi * N, at sketch cost.

    Pass 1 (sketch): per-partition Misra-Gries(k) with k = ceil(2/phi).
    Pigeonhole: an item with global count > N/k ≥ one partition where
    its local count > n_p/k, so the candidate union is a SUPERSET of
    every phi-heavy item. Candidate volume ≤ partitions × k — bounded
    by config, not by vocabulary size.
    Pass 2 (verify): exact counts of candidates only (broadcast
    semi-join), then the exact threshold filter. Output is therefore
    exact — same rows as a full GROUP BY — but the only wide shuffle
    is over the candidate subset.

    NULL items are excluded from the frequency universe (dropped in
    the sketch pass, so they neither inflate N nor collide with the
    partition-count sentinel).
    """
    k = k or max(2, int(2.0 / phi))
    # ONE sketch pass produces both the candidates and (via the
    # NULL-item partition rows) the exact N; checkpoint so neither
    # consumer re-runs it. Sketch size ≤ partitions × (k+1) rows.
    sk = items.mapInPandas(
        _misra_gries_partial(k, value_col), schema="item string, est long"
    ).localCheckpoint(eager=True)
    n_total = sk.filter(F.col("item").isNull()).agg(F.sum("est")).first()[0]
    cand = (
        sk.filter(F.col("item").isNotNull())
        .select(F.col("item").alias(value_col))
        .distinct()
    )
    exact = items.join(F.broadcast(cand), value_col, "left_semi").groupBy(
        value_col
    ).agg(F.count("*").cast("long").alias("cnt"))
    return exact.filter(F.col("cnt") > phi * F.lit(float(n_total))).select(
        value_col, "cnt"
    )


@query(
    "heavy_hitter_tokens",
    oracle="""
    WITH x AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS token
      FROM documents
    ), n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM x)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM x, n
    GROUP BY token, total
    HAVING count(*) > 0.01 * total
    ORDER BY cnt DESC, token
    """,
)
def q_heavy_hitter_tokens(spark, sf_dir):
    """Corpus heavy hitters: tokens above 1% frequency, computed via
    the Misra-Gries sketch + exact-verify plan and proved against the
    oracle's brute-force GROUP BY. The full-vocabulary aggregation the
    oracle runs is exactly what this operator avoids at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    return heavy_hitters(x, "token", phi=0.01).orderBy(
        F.desc("cnt"), "token"
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (DataSketches HLL, Spark-native)
# ---------------------------------------------------------------------------


def daily_user_sketches(ev: DataFrame, lg_k: int = 12) -> DataFrame:
    """Per-(day, event_type) DataSketches HLL sketches of distinct
    user_id — the REAGGREGATABLE form of COUNT(DISTINCT). A stored
    sketch column is what makes distinct-over-time tractable at
    100 TB: exact COUNT(DISTINCT) cannot be rolled up from daily to
    monthly (distinct is not summable), so it must re-scan the raw
    month; sketches union in O(2^lg_k) per group from the daily
    aggregates alone. Uses Spark 3.5+'s built-in `hll_sketch_agg`
    (Apache DataSketches HLL_4, JVM-side, codegen'd) — not a UDF.
    """
    return ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk"))


def rollup_sketches(per_type: DataFrame) -> DataFrame:
    """Roll per-(day, type) sketches up to per-day distinct-user
    estimates by sketch UNION — no raw-data re-scan. `hll_union_agg`
    merges the binary sketches; `hll_sketch_estimate` reads out the
    cardinality. The same two calls roll days to months, months to
    years, from stored aggregates only."""
    return (
        per_type.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_type_sketches"),
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")))
            .cast("long")
            .alias("est_users"),
        )
        .orderBy("day")
    )


@query("sketch_hll_daily_users", rows_only_twin="sketch_hll_exact_twin")
def q_sketch_hll_daily_users(spark, sf_dir):
    """Daily distinct-user estimates from UNIONING per-event-type HLL
    sketches (never re-scanning raw rows at the day grain). Rows-only
    for the driver: DataSketches binary sketches are not replayable in
    ANSI SQL — the lossless twin `sketch_hll_exact_twin` (identical
    shape, exact distinct) is oracle-checked, and
    `test_llm.py::test_hll_sketch_*` proves (a) sketch == exact
    row-for-row at fixture cardinality (HLL list-mode exactness),
    (b) union-of-partition-sketches ≈ direct sketch, (c) relative
    error < 5% (3 sigma at lgK=12) at 100k distinct."""
    ev = load_table(spark, sf_dir, "events")
    return rollup_sketches(daily_user_sketches(ev))


@query(
    "sketch_hll_exact_twin",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_type_sketches,
           CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
    FROM events
    GROUP BY day
    ORDER BY day
    """,
)
def q_sketch_hll_exact_twin(spark, sf_dir):
    """Exact (lossless) twin of `sketch_hll_daily_users`: the same
    per-day output computed with exact COUNT(DISTINCT) — the
    expensive full-shuffle form the sketch rollup replaces at scale.
    Columns are aliased identically so the two results are directly
    diffable; at fixture cardinalities (≤150 distinct users/day,
    inside HLL list-mode) the sketch query returns these exact
    values, asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count_distinct("event_type").cast("long").alias("n_type_sketches"),
            F.count_distinct("user_id").cast("long").alias("est_users"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable frequency sketch, fully oracle-replayable)
# ---------------------------------------------------------------------------


def _cms_hash_pairs(value_col: str, depth: int, width: int) -> F.Column:
    """Array of (depth, bucket) structs for one item — bucket d is the
    60-bit md5 of 'cms{d}:' || value taken mod width. md5 (not
    xxhash64) is the deliberate choice: DuckDB computes the identical
    hex digest, so every count in the sketch — and therefore every
    estimate read from it — is replayable in ANSI SQL. See
    `llm.dedup.MD5_HASH60_SPARK/DUCK` (bit-identity test in
    test_llm.py)."""
    from dynamodb_to_datalake_project_spark.llm.dedup import md5_hash60

    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("depth"),
                (
                    md5_hash60(F.concat(F.lit(f"cms{d}:"), F.col(value_col)))
                    % width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    items: DataFrame, value_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch as a (depth, bucket, cnt) table — the
    RELATIONAL form of the Cormode-Muthukrishnan sketch (point
    estimate = min over depths of the hashed bucket's count;
    guarantees est >= exact always, est <= exact + 2N/width with
    prob 1 - (1/2)^depth).

    Why a table, not a binary blob: (a) merging sketches is a plain
    SUM over (depth, bucket) — any engine can do it; (b) DuckDB can
    rebuild it row-for-row from md5, so CMS-backed operators carry a
    FULL hash-match oracle where binary-sketch aggregates
    (`sketch_hll_daily_users`) are rows-only by design.

    100 TB shape: the explode multiplies rows by `depth`, but the
    groupBy keys are bounded by depth*width (2k cells here), so
    map-side partial aggregation collapses every partition's
    contribution to <= depth*width rows before the one bounded
    shuffle. Nothing in the plan scales with vocabulary size — that
    is the entire point of sketching the stream instead of counting
    it (contrast: the exact GROUP BY in `heavy_hitter_tokens`'s
    oracle)."""
    return (
        items.select(
            F.explode(_cms_hash_pairs(value_col, depth, width)).alias("db")
        )
        .groupBy(
            F.col("db.depth").alias("depth"), F.col("db.bucket").alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge CMS tables built with the SAME (depth, width, hash):
    counts are linear, so union-then-SUM over (depth, bucket) equals
    the sketch of the concatenated streams (asserted exactly in
    test_llm.py). This is what makes per-day / per-source sketches
    roll up without re-scanning raw data."""
    return sketches.groupBy("depth", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    queries_df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate each query row's value against a CMS table:
    min over depths of the matching bucket's count. The sketch side
    is bounded (depth*width rows) and broadcast, so the join adds no
    exchange on the query side — estimating a billion tokens against
    a 2k-cell sketch stays map-only."""
    carry = list(queries_df.columns)
    q = queries_df.select(
        *carry, F.explode(_cms_hash_pairs(value_col, depth, width)).alias("db")
    ).select(*carry, "db.depth", "db.bucket")
    return (
        q.join(F.broadcast(cms), ["depth", "bucket"])
        .groupBy(*carry)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


_CMS_SQL = """
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS token
      FROM documents
    ), depths AS (
      SELECT unnest(range(0, 4)) AS depth
    ), cms AS (
      SELECT depth,
             CAST(concat('0x', substring(md5(concat(
               'cms', CAST(depth AS VARCHAR), ':', token)), 1, 15))
               AS BIGINT) % 512 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM toks, depths
      GROUP BY 1, 2
    ), top AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM toks GROUP BY token
      ORDER BY exact_cnt DESC, token
      LIMIT 20
    ), q AS (
      SELECT t.token, t.exact_cnt, d.depth,
             CAST(concat('0x', substring(md5(concat(
               'cms', CAST(d.depth AS VARCHAR), ':', t.token)), 1, 15))
               AS BIGINT) % 512 AS bucket
      FROM top t, depths d
    )
    SELECT q.token, q.exact_cnt, CAST(MIN(cms.cnt) AS BIGINT) AS cms_est
    FROM q JOIN cms USING (depth, bucket)
    GROUP BY q.token, q.exact_cnt
    ORDER BY exact_cnt DESC, token
"""


@query("sketch_cms_estimate", oracle=_CMS_SQL)
def q_sketch_cms_estimate(spark, sf_dir):
    """Count-min sketch over the corpus token stream, read back at the
    20 most frequent tokens and laid beside their exact counts. The
    oracle rebuilds the ENTIRE sketch — every (depth, bucket) cell —
    from md5 in SQL and reads the same minima, so the driver's hash
    match pins build, merge shape, and estimate end-to-end (the first
    frequency-sketch query here with a full oracle; the HLL rollup is
    rows-only by its binary nature). est >= exact for every token and
    the merge-linearity invariant are additionally property-tested."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    cms = cms_build(toks, "token", depth=4, width=512)
    exact = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    top = exact.orderBy(F.desc("exact_cnt"), "token").limit(20)
    return cms_estimate(cms, top, "token", depth=4, width=512).orderBy(
        F.desc("exact_cnt"), "token"
    )


# ---------------------------------------------------------------------------
# Sketch set algebra: distinct-set overlap from stored aggregates
# ---------------------------------------------------------------------------


def event_type_overlap_sketch(ev: DataFrame, lg_k: int = 12) -> DataFrame:
    """Distinct-USER overlap between every ordered pair of event types
    via HLL set algebra: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
    union sketch built by `hll_union` over the two STORED per-type
    sketches. This is the query stored daily/per-type sketches exist
    to answer at 100 TB — "how many users both clicked and purchased"
    — without COUNT(DISTINCT CASE...) re-scans of raw history: one
    sketch per type (bounded state), then pure sketch algebra.
    Inclusion-exclusion inherits HLL error on three estimates, so the
    intersection is the roughest of the sketch reads (tested against
    exact at fixture cardinality where list-mode makes it equal)."""
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk")
    )
    a, b = per_type.alias("a"), per_type.alias("b")
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.round(F.hll_sketch_estimate(F.col("a.sk"))).cast("long").alias("users_a"),
            F.round(F.hll_sketch_estimate(F.col("b.sk"))).cast("long").alias("users_b"),
            F.round(
                F.hll_sketch_estimate(F.hll_union(F.col("a.sk"), F.col("b.sk")))
            ).cast("long").alias("users_union"),
        )
        .withColumn(
            "users_both",
            (F.col("users_a") + F.col("users_b") - F.col("users_union")).cast("long"),
        )
        .orderBy("type_a", "type_b")
    )


@query("sketch_hll_overlap", rows_only_twin="sketch_hll_overlap_exact")
def q_sketch_hll_overlap(spark, sf_dir):
    """Pairwise distinct-user overlap between event types from HLL
    sketch algebra (inclusion-exclusion over stored sketches — no
    raw-history re-scan). Rows-only for the driver (binary sketches);
    the exact twin `sketch_hll_overlap_exact` carries the full oracle,
    and at fixture cardinality (list-mode) the two queries return
    IDENTICAL rows (asserted in test_llm.py)."""
    ev = load_table(spark, sf_dir, "events")
    return event_type_overlap_sketch(ev)


@query(
    "sketch_hll_overlap_exact",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.user_id AS ua, b.user_id AS ub
      FROM tu a JOIN tu b ON a.event_type < b.event_type
                         AND a.user_id = b.user_id
    ), per_type AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n FROM tu GROUP BY 1
    ), inter AS (
      SELECT type_a, type_b, CAST(COUNT(DISTINCT ua) AS BIGINT) AS users_both
      FROM pairs GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(pa.n AS BIGINT) AS users_a,
           CAST(pb.n AS BIGINT) AS users_b,
           CAST(pa.n + pb.n - i.users_both AS BIGINT) AS users_union,
           i.users_both
    FROM inter i
    JOIN per_type pa ON pa.event_type = i.type_a
    JOIN per_type pb ON pb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)
def q_sketch_hll_overlap_exact(spark, sf_dir):
    """Exact (lossless) twin of `sketch_hll_overlap`: the same pair
    rows computed with exact distinct intersections — the full-shuffle
    form the sketch algebra replaces. Identical column names, directly
    diffable."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.event_type") < F.col("b.event_type"))
            & (F.col("a.user_id") == F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count_distinct(F.col("a.user_id")).cast("long").alias("users_both"))
    )
    per = tu.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n")
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n").alias("users_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n").alias("users_b"))
    return (
        inter.join(pa, "type_a")
        .join(pb, "type_b")
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            (F.col("users_a") + F.col("users_b") - F.col("users_both"))
            .cast("long")
            .alias("users_union"),
            "users_both",
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Grid quantile sketch (mergeable, bounded-state, fully oracle-replayable)
# ---------------------------------------------------------------------------


def quantile_grid_build(
    items: DataFrame, value_col: str, lo: float, hi: float, buckets: int = 256
) -> DataFrame:
    """Equi-width histogram sketch over a KNOWN value range: a
    (bucket, cnt) table with exactly `buckets` possible rows — the
    quantile member of the sketch family here (frequency: `cms_build`,
    distinct: HLL). Like the CMS it is a relational sketch: merging is
    a plain SUM over buckets, and every cell is rebuildable in ANSI
    SQL, so quantile reads carry a FULL hash-match oracle where
    KLL/t-digest blobs would be rows-only.

    Error contract: a quantile read from the grid is exact in RANK
    ordering up to one bucket — the returned value is off by at most
    one bucket width (hi-lo)/buckets from an exact quantile
    (property-tested). Values outside [lo, hi) clamp to the edge
    buckets (the standard histogram-sketch convention), keeping state
    bounded even under outliers.

    100 TB shape: map-side partial aggregation collapses every
    partition to <= `buckets` rows before the one bounded shuffle;
    nothing scales with row count or distinct-value count."""
    width = (hi - lo) / buckets
    b = F.least(
        F.lit(buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    return (
        items.filter(F.col(value_col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_grid_read(
    grid: DataFrame, qs: "list[float]", lo: float, hi: float, buckets: int = 256
) -> DataFrame:
    """Read quantiles from a grid sketch: for quantile q, find the
    first bucket whose cumulative count reaches ceil(q*N) and return
    the bucket's UPPER edge (a deterministic, merge-stable convention
    — no interpolation, so the read is pure integer rank arithmetic
    plus one float multiply, bit-identical across engines). One row
    per requested q: (q, rank, est) with est within one bucket width
    of the exact quantile."""
    width = (hi - lo) / buckets
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    # upper edge is monotone in bucket, so the first bucket whose
    # cumulative count reaches the rank is MIN(edge | cum >= rank) —
    # one window + one broadcast rank join + one groupBy for ALL
    # quantiles (the per-q loop cost 4 exchanges each; round 10)
    cum = grid.select(
        (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("edge"),
        F.sum("cnt").over(w).cast("long").alias("cum"),
    )
    n = grid.agg(F.sum("cnt").cast("long").alias("n"))
    qdf = grid.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    ranks = qdf.crossJoin(n).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("rank")
    )
    return (
        F.broadcast(ranks)
        .join(cum, cum["cum"] >= ranks["rank"])
        .groupBy("q", "rank")
        .agg(F.min("edge").alias("est"))
        .orderBy("q")
    )


@query(
    "sketch_quantile_grid",
    oracle="""
    WITH v AS (
      SELECT value FROM events WHERE value IS NOT NULL
    ), grid AS (
      SELECT LEAST(255, GREATEST(0,
               CAST(FLOOR(value / (1000.0 / 256)) AS INTEGER))) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1
    ), cum AS (
      SELECT bucket, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
      FROM grid
    ), n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM grid),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    SELECT CAST(q AS DOUBLE) AS q,
           CAST(CEIL(q * n.n) AS BIGINT) AS rank,
           (SELECT MIN((bucket + 1) * (1000.0 / 256))
            FROM cum WHERE cum.cum >= CEIL(q * n.n)) AS est
    FROM qs, n
    ORDER BY q
    """,
)
def q_sketch_quantile_grid(spark, sf_dir):
    """Quantiles of the events value column read from a 256-bucket
    grid sketch over the known [0, 1000) fixture range. The oracle
    rebuilds the grid, the cumulative ranks, and the bucket-edge reads
    in SQL — every cell and every estimate hash-matches (integer rank
    arithmetic + one float multiply per read). Within-one-bucket
    accuracy vs exact quantiles and SUM-mergeability are
    property-tested in test_llm.py."""
    ev = load_table(spark, sf_dir, "events")
    grid = quantile_grid_build(ev, "value", 0.0, 1000.0, 256)
    return quantile_grid_read(grid, [0.5, 0.9, 0.99], 0.0, 1000.0, 256)


# ---------------------------------------------------------------------------
# HDR quantile sketch (log2 octave + linear sub-bucket — mergeable
# quantiles over an UNKNOWN range, the gap quantile_grid leaves open)
# ---------------------------------------------------------------------------


def hdr_sketch_build(
    items: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
    sub_buckets: int = 32,
) -> DataFrame:
    """Mergeable quantile sketch over an UNKNOWN value range — the
    HdrHistogram design (Tene, public domain; same family as
    DDSketch's log buckets, VLDB'19): values scale to integer ticks,
    each tick lands in (octave e = floor(log2(t)), linear sub-bucket
    within the octave). Guarantees follow from the bucketing, with no
    prior [lo, hi) knowledge:

    - relative-error contract: a bucket spans 2^e/S ticks inside
      [2^e, 2^(e+1)), so any read is within a factor (1 + 1/S) of an
      exact quantile (property-tested);
    - bounded state: <= 64*S + 1 possible rows, whatever the data;
    - SUM-merge: sketches merge by adding cnt per (e, sub) — the same
      relational-sketch discipline as cms_build/quantile_grid, which
      is what makes the sketch ANSI-SQL-replayable where KLL/t-digest
      byte blobs would be rows-only.

    Integer-exactness is deliberate: e comes from the BINARY-STRING
    length of t (never floating log, whose libm rounding differs
    across engines at bucket edges) and sub-bucket math is shifts and
    integer division, so Spark and DuckDB agree bit-for-bit. Nulls
    drop; values <= 0 clamp to the zero bucket (e = -1) — the
    HdrHistogram non-negative convention. `sub_buckets` must be a
    power of two (shift-only math; 32 -> 3.1% relative error).

    100 TB shape: map-side partial aggregation collapses every
    partition to the bounded bucket set before one bounded shuffle;
    nothing scales with row count, distinct count, or value range."""
    s = sub_buckets.bit_length() - 1
    if sub_buckets != 1 << s:
        raise ValueError("hdr: sub_buckets must be a power of two")
    t = F.greatest(
        F.lit(0).cast("long"),
        F.floor(F.col(value_col) * F.lit(scale)).cast("long"),
    )
    return (
        items.filter(F.col(value_col).isNotNull())
        .select(t.alias("t"))
        .withColumn(
            "e",
            F.when(F.col("t") <= 0, F.lit(-1)).otherwise(
                F.length(F.bin(F.col("t"))) - 1
            ),
        )
        .withColumn(
            "sub",
            F.when(F.col("e") < 0, F.lit(0).cast("long")).otherwise(
                # (t - 2^e) / (2^e / S), overflow-safe split: shift
                # down when the octave is wider than S, multiply up
                # when it is narrower (then everything is tiny)
                F.expr(
                    f"CASE WHEN e >= {s} THEN"
                    f" (t - shiftleft(1L, e)) div shiftleft(1L, e - {s})"
                    f" ELSE ((t - shiftleft(1L, e)) * {1 << s})"
                    f" div shiftleft(1L, e) END"
                )
            ),
        )
        .groupBy("e", "sub")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hdr_sketch_read(
    grid: DataFrame, qs: "list[float]", sub_buckets: int = 32
) -> DataFrame:
    """Quantile reads from an HDR sketch: rank = ceil(q*N), first
    bucket (octave-major order) whose cumulative count reaches it,
    estimate = the bucket's UPPER edge in ticks (the quantile_grid
    convention — deterministic, merge-stable, pure integer math; no
    interpolation, so reads hash-match across engines). One row per
    q: (q, rank, est_ticks)."""
    s = sub_buckets.bit_length() - 1
    w = Window.orderBy("e", "sub").rowsBetween(Window.unboundedPreceding, 0)
    edge = F.expr(
        f"CASE WHEN e < 0 THEN 0L"
        f" WHEN e >= {s} THEN"
        f" shiftleft(1L, e) + (sub + 1) * shiftleft(1L, e - {s})"
        f" ELSE shiftleft(1L, e)"
        f" + ((sub + 1) * shiftleft(1L, e)) div {1 << s} END"
    )
    # edge is strictly monotone in (e, sub) — octave boundaries
    # included — so the first bucket reaching the rank is
    # MIN(edge | cum >= rank): one window + one broadcast rank join
    # + one groupBy for ALL quantiles (round 10, was 4 exchanges/q)
    cum = grid.select(
        edge.alias("edge"), F.sum("cnt").over(w).cast("long").alias("cum")
    )
    n = grid.agg(F.sum("cnt").cast("long").alias("n"))
    qdf = grid.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    ranks = qdf.crossJoin(n).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("rank")
    )
    return (
        F.broadcast(ranks)
        .join(cum, cum["cum"] >= ranks["rank"])
        .groupBy("q", "rank")
        .agg(F.min("edge").alias("est_ticks"))
        .orderBy("q")
    )


_HDR_SQL = """
WITH t AS (
  SELECT GREATEST(CAST(0 AS BIGINT),
                  CAST(FLOOR(value * 1000000) AS BIGINT)) AS t
  FROM events WHERE value IS NOT NULL
), b AS (
  SELECT t,
         CASE WHEN t <= 0 THEN -1
              ELSE length(bin(t)) - 1 END AS e
  FROM t
), g AS (
  SELECT e,
         CASE WHEN e < 0 THEN 0
              WHEN e >= 5 THEN
                (t - (CAST(1 AS BIGINT) << e))
                  // (CAST(1 AS BIGINT) << (e - 5))
              ELSE ((t - (CAST(1 AS BIGINT) << e)) * 32)
                  // (CAST(1 AS BIGINT) << e) END AS sub,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2
), cum AS (
  SELECT CASE WHEN e < 0 THEN CAST(0 AS BIGINT)
              WHEN e >= 5 THEN
                (CAST(1 AS BIGINT) << e)
                  + (sub + 1) * (CAST(1 AS BIGINT) << (e - 5))
              ELSE (CAST(1 AS BIGINT) << e)
                  + ((sub + 1) * (CAST(1 AS BIGINT) << e)) // 32
         END AS edge,
         cnt,
         CAST(SUM(cnt) OVER (ORDER BY e, sub) AS BIGINT) AS cum
  FROM g
), n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
SELECT CAST(q AS DOUBLE) AS q,
       CAST(CEIL(q * n.n) AS BIGINT) AS rank,
       (SELECT MIN(edge) FROM cum WHERE cum.cum >= CEIL(q * n.n))
         AS est_ticks
FROM qs, n
ORDER BY q
"""


@query("sketch_hdr_quantile", oracle=_HDR_SQL)
def q_sketch_hdr_quantile(spark, sf_dir):
    """Quantiles of the events value column from an HDR sketch that
    was told NOTHING about the value range (round-8 verdict item 5 —
    quantile_grid requires a known [lo, hi); real telemetry doesn't
    have one). The oracle rebuilds octaves, sub-buckets, cumulative
    ranks, and upper-edge reads in pure integer SQL — every cell
    hash-matches because bucket indices come from binary-string
    length and shifts, never floating log. Accuracy ((1 + 1/S)
    relative) and SUM-merge invariants are property-tested in
    test_llm.py."""
    ev = load_table(spark, sf_dir, "events")
    grid = hdr_sketch_build(ev, "value", 1_000_000, 32)
    return hdr_sketch_read(grid, [0.5, 0.9, 0.99], 32)


# ---------------------------------------------------------------------------
# KMV distinct sketch (k-minimum-values — approximate COUNT DISTINCT
# with a FULL oracle, unlike the binary HLL blobs)
# ---------------------------------------------------------------------------


def kmv_distinct(
    items: DataFrame, value_col: str, group_cols: "list[str]", k: int = 32
) -> DataFrame:
    """Approximate per-group COUNT DISTINCT via the k-minimum-values
    estimator (Bar-Yossef et al. 2002): keep each group's k smallest
    60-bit md5 hashes of the value; with h_(k) the k-th smallest as a
    fraction of the hash space, est = (k-1)/h_(k). Fewer than k
    distinct values → the sketch holds them all and the estimate is
    EXACT. Standard error ≈ 1/sqrt(k-2).

    Why it exists next to the HLL column: HLL (binary DataSketches
    blob) is the production distinct sketch but is rows-only for the
    oracle gate; KMV is pure md5 arithmetic, so DuckDB rebuilds every
    kept hash and the estimate itself hash-matches — the approximate-
    distinct path with a FULL correctness proof. A KMV sketch is also
    mergeable (union the hash sets, re-take the k smallest) and
    supports set operations MinHash-style.

    Scale shape: one distinct-hash aggregation (bounded by distinct
    values, with map-side partials), one bounded-key window keeping k
    rows per group, one k-row-per-group aggregation. The estimate is
    one double division of exact integers."""
    from dynamodb_to_datalake_project_spark.llm.dedup import md5_hash60

    h = (
        items.select(*group_cols, md5_hash60(F.col(value_col).cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = h.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("h").cast("long").alias("kth_hash"),
        )
        .select(
            *group_cols,
            "n_kept",
            "kth_hash",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(
                F.lit(float(k - 1))
                / (F.col("kth_hash").cast("double") / F.lit(float(1 << 60)))
            )
            .alias("est_distinct"),
        )
    )


@query(
    "sketch_kmv_distinct",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
      FROM events
    ), kept AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM h
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MAX(h) AS BIGINT) AS kth_hash,
           CASE WHEN COUNT(*) < 32 THEN CAST(COUNT(*) AS DOUBLE)
                ELSE 31.0 / (CAST(MAX(h) AS DOUBLE)
                             / CAST(1152921504606846976 AS DOUBLE)) END
             AS est_distinct
    FROM kept WHERE rk <= 32
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_sketch_kmv_distinct(spark, sf_dir):
    """Distinct users per event type via a KMV(32) sketch — the
    approximate-distinct estimator whose every kept hash AND final
    estimate DuckDB rebuilds from md5 (full hash match, where the HLL
    twin pair can only prove the exact side). 2^60 appears as the
    literal 1152921504606846976 in the SQL. Relative accuracy
    (~1/sqrt(30)) vs exact distinct is asserted in test_llm.py."""
    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", ["event_type"], k=32).orderBy("event_type")


def kmv_jaccard_sources(
    docs: DataFrame, k: int = 128
) -> DataFrame:
    """Pairwise SET similarity between sources from KMV sketches: for
    each source, keep the k smallest md5-60 token hashes; for a pair,
    take the k smallest of the UNION of the two sketches and estimate
    J = |{h in those k} present in both| / k (the KMV coincidence
    estimator — the unbanded cousin of MinHash-LSH, right when you
    want a full similarity MATRIX over a bounded number of groups
    rather than candidate pairs over millions of docs).

    Everything after the per-source sketch is k-row arithmetic: the
    pair stage joins two k-row sketches, so the matrix costs
    O(sources² · k) — independent of corpus size, the whole point.
    Exact twin: `source_overlap_matrix` computes the same shape
    exactly; the accuracy test pins the sketch within 3/sqrt(k) of
    the exact Jaccard."""
    from dynamodb_to_datalake_project_spark.llm.dedup import md5_hash60
    from dynamodb_to_datalake_project_spark.llm.text import tokens

    h = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .select("source", md5_hash60(F.col("tok")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    kept = h.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    srcs = kept.select("source").distinct()
    pairs = (
        srcs.alias("x")
        .join(srcs.alias("y"), F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
    )
    # each pair pulls BOTH sides' k-row sketches (two equi-joins — a
    # single source-inequality join of hash rows would cross the two
    # sketches k x k and destroy the coincidence counts); a hash then
    # appears once per side it belongs to, so n_sides == 2 means
    # "present in both sketches"
    ua = pairs.join(kept, F.col("source") == F.col("src_a")).select(
        "src_a", "src_b", "h"
    )
    ub = pairs.join(kept, F.col("source") == F.col("src_b")).select(
        "src_a", "src_b", "h"
    )
    u = (
        ua.unionByName(ub)
        .groupBy("src_a", "src_b", "h")
        .agg(F.count("*").alias("n_sides"))
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    topk = u.withColumn("rk", F.row_number().over(wp)).filter(F.col("rk") <= k)
    return (
        topk.groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.sum(F.when(F.col("n_sides") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_both"),
        )
        .select(
            "src_a",
            "src_b",
            "k_used",
            "n_both",
            (F.col("n_both").cast("double") / F.col("k_used").cast("double")).alias(
                "jaccard_est"
            ),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "sketch_kmv_source_jaccard",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT source,
             CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT source,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
      )
    ), kept AS (
      SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM toks
      ) WHERE rk <= 128
    ), srcs AS (
      SELECT DISTINCT source FROM kept
    ), pairs AS (
      SELECT x.source AS src_a, y.source AS src_b
      FROM srcs x JOIN srcs y ON x.source < y.source
    ), u AS (
      SELECT src_a, src_b, h, COUNT(*) AS n_sides FROM (
        SELECT p.src_a, p.src_b, k.h FROM pairs p JOIN kept k ON k.source = p.src_a
        UNION ALL
        SELECT p.src_a, p.src_b, k.h FROM pairs p JOIN kept k ON k.source = p.src_b
      ) GROUP BY 1, 2, 3
    ), topk AS (
      SELECT src_a, src_b, h, n_sides FROM (
        SELECT src_a, src_b, h, n_sides,
               ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
        FROM u
      ) WHERE rk <= 128
    )
    SELECT src_a, src_b,
           CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(SUM(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both,
           CAST(SUM(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS jaccard_est
    FROM topk GROUP BY src_a, src_b
    ORDER BY src_a, src_b
    """,
)
def q_sketch_kmv_source_jaccard(spark, sf_dir):
    """Token-set similarity matrix between sources from KMV(128)
    sketches — O(sources²·k) after one sketch pass, corpus-size-
    independent. The oracle rebuilds the per-source sketches, the
    per-pair union top-k, and the coincidence estimates from md5 —
    full hash match including the one-division Jaccard doubles.
    Accuracy vs the exact `source_overlap_matrix` is asserted in
    test_llm.py."""
    docs = load_table(spark, sf_dir, "documents")
    return kmv_jaccard_sources(docs, k=128)


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin-Lang-Liberty 2016, arXiv:1603.05346) —
# the rank-error companion to the value-error HDR sketch above
# ---------------------------------------------------------------------------


class _KLL:
    """One compactor-family quantile sketch (the KLL compactor
    framework, Karnin-Lang-Liberty 2016, arXiv:1603.05346, with the
    DETERMINISTIC uniform level capacity of Munro-Paterson/
    Manku-Rajagopalan-Lindsay): levels of capacity k; when a level
    fills, sort it and promote every other item to the level above
    at doubled weight. KLL's geometrically shrinking caps need the
    randomized coin for their probabilistic bound; uniform caps give
    the WORST-CASE guarantee a correctness-gated engine wants —
    each compaction of a level-l buffer perturbs any rank by at most
    2^l, so err_bound = sum(2^l per compaction) <= n*H/k with
    H = number of levels ~ log2(n/k). The keep-parity alternates
    per level (deterministic; consecutive errors largely cancel,
    observed error is typically ~10x below the bound). Weight is
    conserved exactly: an odd buffer leaves its maximum behind at
    the same level before halving."""

    __slots__ = ("k", "levels", "parity", "err_bound")

    def __init__(self, k: int):
        self.k = max(4, k)
        self.levels: "list[list]" = [[]]
        self.parity: dict[int, int] = {}
        self.err_bound = 0

    def add(self, v: float) -> None:
        self.levels[0].append(v)
        lv = 0
        while lv < len(self.levels) and len(self.levels[lv]) >= self.k:
            self._compact(lv)
            lv += 1

    def _compact(self, lv: int) -> None:
        buf = sorted(self.levels[lv])
        leftover = []
        if len(buf) % 2 == 1:
            leftover = [buf.pop()]  # weight conservation on odd sizes
        p = self.parity.get(lv, 0)
        self.parity[lv] = 1 - p
        if lv + 1 == len(self.levels):
            self.levels.append([])
        self.levels[lv + 1].extend(buf[p::2])
        self.levels[lv] = leftover
        self.err_bound += 1 << lv

    def items(self) -> "list[tuple[float, int]]":
        return [
            (v, 1 << lv)
            for lv, buf in enumerate(self.levels)
            for v in buf
        ]


def kll_build_values(values, k: int = 200):
    """Sequential KLL over an iterable: returns (items, err_bound)
    with items a list of (value, weight=2^level) pairs."""
    sk = _KLL(k)
    for v in values:
        sk.add(v)
    return sk.items(), sk.err_bound


def kll_sketch_build(
    items: DataFrame, value_col: str, k: int = 200
) -> DataFrame:
    """Distributed KLL: each partition folds its rows into one KLL
    sketch (Arrow-batched mapInPandas — the sketch state, not the
    data, lives in memory), emitted as (value, weight) rows. Merging
    partitions is a plain UNION + groupBy-SUM on value — a union of
    valid KLL item sets is itself a valid weighted sample whose rank
    error is the SUM of the parts' bounds (compaction only shrinks
    state; reading the union directly adds no error), so the merge
    keeps the relational-sketch discipline of cms/grid/hdr/kmv.

    100 TB shape: state is ~k*log(n_p/k) rows per partition
    (compaction is local and streaming), one bounded shuffle merges
    P*k*H rows — never the data. With the lossless configuration
    (k > partition rows) no compaction fires and the sketch is an
    exact, order-independent function of the multiset — that twin
    carries the full hash-match oracle."""
    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql import types as T

    schema_t = T.StructType(
        [
            T.StructField("value", T.DoubleType()),
            T.StructField("weight", T.LongType()),
        ]
    )

    def op(batches: "_Iterator[_pd.DataFrame]") -> "_Iterator[_pd.DataFrame]":
        sk = _KLL(k)
        for pdf in batches:
            for v in pdf[value_col]:
                if v is None or v != v:  # None/NaN drop
                    continue
                sk.add(float(v))
        its = sk.items()
        yield _pd.DataFrame(
            {
                "value": [v for v, _ in its],
                "weight": [w for _, w in its],
            }
        )

    return (
        items.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("double").alias(value_col))
        .mapInPandas(op, schema_t)
        .groupBy("value")
        .agg(F.sum("weight").cast("long").alias("weight"))
    )


def kll_quantile_read(sketch: DataFrame, qs: "list[float]") -> DataFrame:
    """Rank reads from a (value, weight) sketch: rank = ceil(q*N)
    over summed weights, estimate = the smallest value whose
    cumulative weight reaches it (the grid/hdr read convention —
    values pass through untouched, so the exact-config read is
    bit-identical across engines).

    Plan shape: ONE window pass over the bounded sketch, one
    broadcast of the tiny (q, rank) table, one groupBy — the picked
    value is MIN(value | cum >= rank) because cum is monotone in
    value, so no per-q union of window+join legs (the naive loop
    cost 4 exchanges per quantile; this reads any number of
    quantiles in ~4 total)."""
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "value", F.sum("weight").over(w).cast("long").alias("cum")
    )
    n = sketch.agg(F.sum("weight").cast("long").alias("n"))
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    ranks = qdf.crossJoin(n).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("rank")
    )
    return (
        F.broadcast(ranks)
        .join(cum, cum["cum"] >= ranks["rank"])
        .groupBy("q", "rank")
        .agg(F.min("value").alias("est"))
        .orderBy("q")
    )


_KLL_EXACT_SQL = """
WITH v AS (
  SELECT value FROM events WHERE value IS NOT NULL
), g AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1
), cum AS (
  SELECT value, CAST(SUM(cnt) OVER (ORDER BY value) AS BIGINT) AS cum
  FROM g
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
qs AS (SELECT unnest([0.05, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
SELECT CAST(q AS DOUBLE) AS q,
       CAST(CEIL(q * n.n) AS BIGINT) AS rank,
       (SELECT MIN(value) FROM cum WHERE cum.cum >= CEIL(q * n.n)) AS est
FROM qs, n
ORDER BY q
"""


@query("sketch_kll_quantile", oracle=_KLL_EXACT_SQL)
def q_sketch_kll_quantile(spark, sf_dir):
    """Quantiles of the events value column through the KLL pipeline
    in its LOSSLESS configuration (k far above any partition's row
    count: zero compactions, every item weight 1) — the sketch is
    then an exact, partitioning-independent function of the multiset
    and the read hash-matches DuckDB's rank-quantile recomputation
    bit-for-bit. The same build/merge/read path with a small k is
    `sketch_kll_compacted`; its rank-error and merge-additivity
    guarantees are property-tested in test_llm.py."""
    ev = load_table(spark, sf_dir, "events")
    sk = kll_sketch_build(ev, "value", k=1 << 22)
    return kll_quantile_read(sk, [0.05, 0.25, 0.5, 0.75, 0.9, 0.99])


@query("sketch_kll_compacted", rows_only_twin="sketch_kll_quantile")
def q_sketch_kll_compacted(spark, sf_dir):
    """The production KLL configuration (k=128): real compactions,
    bounded per-partition state, union-merged reads. Rank error is
    bounded by the sum of per-partition compaction bounds (asserted
    against the exact quantiles in test_llm.py); the read itself is
    partition-layout-dependent, hence rows-only here."""
    ev = load_table(spark, sf_dir, "events")
    sk = kll_sketch_build(ev, "value", k=128)
    return kll_quantile_read(sk, [0.05, 0.25, 0.5, 0.75, 0.9, 0.99])
