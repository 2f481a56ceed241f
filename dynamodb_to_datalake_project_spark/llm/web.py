"""URL / domain curation — the standard CCNet/RefinedWeb web-corpus
stage: URL canonicalization (scheme/host lowering, www-strip,
registered-domain extraction, path normalization, tracking-param
removal), per-domain document/token statistics, and the domain-level
quality join back onto documents.

All pure column expressions over Spark's JVM-side `parse_url` plus
regexp/array functions — map-only per-document work, one bounded-key
hash aggregation for the domain rollup (registered domains ≪
documents), and a broadcast join back (the domain table is tiny by
construction). On 100 TB of web documents these run at parquet-scan
speed; nothing here shuffles the raw corpus except the single domain
aggregation, which map-side-combines to one row per domain per task.

The `documents` fixture has no URL column, so URLs are synthesized by
a deterministic integer formula over (doc_id, source) — the same
fixture-formula pattern as `llm.multimodal` — exercising every
canonicalization branch: uppercase scheme/host, www/eu subdomains,
multi-label public suffixes (co.uk), explicit ports, duplicate-slash
and /./ path segments, trailing slashes, utm tracking params, unsorted
query strings, and fragments. The DuckDB oracles replay the SAME
formula and the SAME normalization in SQL string functions, so every
query here is a full hash-match oracle.

Reference parity: none — north-star LLM-corpus curation tooling
(SURVEY.md §2.8); stage modeled on the public CCNet / RefinedWeb
pipeline descriptions (Wenzek 2019, Penedo 2023).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table

#: query params stripped during canonicalization (tracking/attribution)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)="

#: multi-label public suffixes recognized by the registered-domain
#: extraction (public-suffix-list-lite; the full PSL is a data file,
#: the mechanism is identical)
MULTI_LABEL_SUFFIXES = (
    "co.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "co.jp",
    "co.in",
    "com.br",
)

_SITES = ("news", "blog", "docs", "wiki", "shop", "forum", "cdn")
_TLDS = ("com", "org", "co.uk", "io", "de")
_SUBS = ("www.", "eu.", "")


def synth_url(doc_id: Column, source: Column) -> Column:
    """Deterministic fixture URL for a document — integer formula over
    (doc_id, source), replayed verbatim by `SYNTH_URL_SQL` on the
    DuckDB side. Covers every branch `canonicalize_urls` normalizes."""
    d = doc_id
    site = F.element_at(F.array(*[F.lit(s) for s in _SITES]), (d % 7 + 1).cast("int"))
    tld = F.element_at(F.array(*[F.lit(t) for t in _TLDS]), (d % 5 + 1).cast("int"))
    sub = F.element_at(F.array(*[F.lit(s) for s in _SUBS]), (d % 3 + 1).cast("int"))
    host = F.concat(sub, site, F.lit("-"), source, F.lit("."), tld)
    host = F.when(d % 11 == 0, F.upper(host)).otherwise(host)
    scheme = (
        F.when(d % 11 == 0, F.lit("HTTPS"))
        .when(d % 2 == 0, F.lit("https"))
        .otherwise(F.lit("http"))
    )
    port = F.when(d % 13 == 0, F.lit(":8080")).otherwise(F.lit(""))
    seg = (
        F.when(d % 9 == 0, F.lit("/articles//item-"))
        .when(d % 9 == 1, F.lit("/articles/./item-"))
        .otherwise(F.lit("/articles/item-"))
    )
    path = F.concat(
        seg, d.cast("string"), F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit(""))
    )
    qry = F.concat(
        F.lit("?"),
        F.when(d % 2 == 1, F.lit("utm_source=feed&")).otherwise(F.lit("")),
        F.lit("id="),
        d.cast("string"),
        F.when(d % 5 == 0, F.lit("&ref=tw")).otherwise(F.lit("")),
    )
    frag = F.when(
        d % 6 == 0, F.concat(F.lit("#sec"), (d % 3).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, qry, frag)


#: the same formula in DuckDB SQL (1-indexed list literals); yields a
#: column named `url` given `doc_id` and `source` in scope
SYNTH_URL_SQL = """
    (CASE WHEN doc_id % 11 = 0 THEN 'HTTPS'
          WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
    || '://'
    || (CASE WHEN doc_id % 11 = 0 THEN upper(u_host) ELSE u_host END)
    || (CASE WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END)
    || (CASE WHEN doc_id % 9 = 0 THEN '/articles//item-'
             WHEN doc_id % 9 = 1 THEN '/articles/./item-'
             ELSE '/articles/item-' END)
    || CAST(doc_id AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
    || '?'
    || (CASE WHEN doc_id % 2 = 1 THEN 'utm_source=feed&' ELSE '' END)
    || 'id=' || CAST(doc_id AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN '&ref=tw' ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
        ELSE '' END)
"""

#: host-before-casing helper for SYNTH_URL_SQL (sub + site + '-' +
#: source + '.' + tld)
SYNTH_HOST_SQL = """
    (['www.', 'eu.', ''])[(doc_id % 3) + 1]
    || (['news','blog','docs','wiki','shop','forum','cdn'])[(doc_id % 7) + 1]
    || '-' || source || '.'
    || (['com','org','co.uk','io','de'])[(doc_id % 5) + 1]
"""

#: shared canonicalization in DuckDB SQL: CTE fragment from a relation
#: `u(doc_id, url, ...)` to canonical fields. Mirrors
#: `canonicalize_urls` branch for branch.
_CANON_SQL = """
    p AS (
      SELECT *,
        lower(regexp_extract(url, '^([^:]+)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS hostport,
        regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS path_raw,
        regexp_extract(url, '\\?([^#]*)', 1) AS query_raw
      FROM u
    ),
    h AS (
      SELECT *,
        regexp_replace(
          regexp_replace(hostport, ':[0-9]+$', ''), '^www\\.', '') AS host,
        TRY_CAST(nullif(regexp_extract(hostport, ':([0-9]+)$', 1), '')
                 AS BIGINT) AS port
      FROM p
    ),
    c AS (
      SELECT *,
        CASE WHEN len(string_split(host, '.')) >= 3
                  AND array_to_string(string_split(host, '.')[-2:], '.')
                      IN ('co.uk','ac.uk','gov.uk','com.au','co.jp',
                          'co.in','com.br')
             THEN array_to_string(string_split(host, '.')[-3:], '.')
             ELSE array_to_string(string_split(host, '.')[-2:], '.')
        END AS registered_domain,
        regexp_replace(
          regexp_replace(
            regexp_replace(path_raw, '/{2,}', '/', 'g'),
            '(?:/\\.)+/', '/', 'g'),
          '(.)/$', '\\1') AS path_norm,
        array_to_string(list_sort(list_filter(string_split(query_raw, '&'),
          x -> x <> '' AND NOT regexp_matches(x,
            '^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)='))), '&') AS query_norm
      FROM h
    ),
    canon AS (
      SELECT *,
        scheme || '://' || host
        || (CASE WHEN port IS NOT NULL THEN ':' || CAST(port AS VARCHAR)
            ELSE '' END)
        || path_norm
        || (CASE WHEN query_norm <> '' THEN '?' || query_norm ELSE '' END)
        AS url_canonical
      FROM c
    )
"""


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canonical URL columns: `scheme` (lowered), `host`
    (lowered, port- and leading-www-stripped), `port` (nullable long),
    `registered_domain` (last two host labels, or three over a
    multi-label public suffix), `path_norm` (duplicate slashes
    collapsed, `/./` segments removed, trailing slash stripped except
    root), `query_norm` (tracking params dropped, remainder sorted),
    and the reassembled `url_canonical` (fragment dropped).

    JVM-side throughout — `parse_url` + regexp/array expressions inside
    whole-stage codegen; map-only, no shuffle, linear in corpus bytes."""
    u = F.col(url_col)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    hostport = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    port = F.nullif(F.regexp_extract(hostport, r":(\d+)$", 1), F.lit("")).cast(
        "long"
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":\d+$", ""), r"^www\.", ""
    )
    labels = F.split(host, r"\.")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    registered = F.when(
        (F.size(labels) >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES), last3
    ).otherwise(last2)
    path_norm = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.parse_url(u, F.lit("PATH")), "/{2,}", "/"
            ),
            r"(?:/\.)+/",
            "/",
        ),
        "(.)/$",
        "$1",
    )
    params = F.filter(
        F.split(F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")), "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    query_norm = F.array_join(F.array_sort(params), "&")
    out = (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("port", port)
        .withColumn("registered_domain", registered)
        .withColumn("path_norm", path_norm)
        .withColumn("query_norm", query_norm)
    )
    return out.withColumn(
        "url_canonical",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.when(
                F.col("port").isNotNull(),
                F.concat(F.lit(":"), F.col("port").cast("string")),
            ).otherwise(F.lit("")),
            F.col("path_norm"),
            F.when(
                F.col("query_norm") != "", F.concat(F.lit("?"), F.col("query_norm"))
            ).otherwise(F.lit("")),
        ),
    )


def _docs_with_urls(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("url", synth_url(F.col("doc_id"), F.col("source")))


def domain_stats(canon: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-registered-domain corpus statistics: document/host counts,
    token totals, average document length, and a length-based quality
    tier. ONE bounded-key hash aggregation (map-side partials; the
    domain key space is tiny relative to the corpus); the average is a
    single double division of exact integer sums per the catalog float
    policy."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    agg = (
        canon.withColumn("n_tokens", F.size(toks).cast("long"))
        .groupBy("registered_domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("host").alias("n_hosts"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("_sum_chars"),
        )
    )
    avg_chars = F.col("_sum_chars").cast("double") / F.col("n_docs").cast("double")
    return agg.select(
        "registered_domain",
        "n_docs",
        "n_hosts",
        "n_tokens",
        avg_chars.alias("avg_chars"),
        F.when(avg_chars >= 300, "high")
        .when(avg_chars >= 200, "mid")
        .otherwise("low")
        .alias("quality_tier"),
    )


@query(
    "web_url_canonicalize",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, {SYNTH_HOST_SQL} AS u_host FROM documents
    ),
    u AS (
      SELECT u0.doc_id, {SYNTH_URL_SQL} AS url
      FROM u0 JOIN documents USING (doc_id)
    ),
    {_CANON_SQL}
    SELECT doc_id, url, scheme, host, port, registered_domain,
           path_norm, query_norm, url_canonical
    FROM canon
    ORDER BY doc_id
    """,
)
def q_web_url_canonicalize(spark, sf_dir):
    """Canonicalize every document URL — the dedup key and crawl-seed
    normalization step of a web-corpus pipeline. Map-only `parse_url` +
    regexp work; the oracle replays the synthesis formula AND the
    normalization in DuckDB string functions (full hash-match)."""
    # no orderBy: the driver compare is order-insensitive, and a global
    # sort over the full corpus is the one exchange this map-only plan
    # would otherwise pay (the oracle keeps ORDER BY for readability)
    canon = canonicalize_urls(_docs_with_urls(spark, sf_dir))
    return canon.select(
        "doc_id",
        "url",
        "scheme",
        "host",
        "port",
        "registered_domain",
        "path_norm",
        "query_norm",
        "url_canonical",
    )


@query(
    "web_domain_stats",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, {SYNTH_HOST_SQL} AS u_host FROM documents
    ),
    u AS (
      SELECT d.doc_id, d.text, d.n_chars, {SYNTH_URL_SQL} AS url
      FROM u0 JOIN documents d USING (doc_id)
    ),
    {_CANON_SQL}
    SELECT registered_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
                AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
           CASE WHEN CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     >= 300 THEN 'high'
                WHEN CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     >= 200 THEN 'mid'
                ELSE 'low' END AS quality_tier
    FROM canon
    GROUP BY registered_domain
    ORDER BY registered_domain
    """,
)
def q_web_domain_stats(spark, sf_dir):
    """Per-domain doc/token statistics with a quality tier — the
    CCNet-style domain scoreboard that drives keep/downsample/drop
    decisions. One bounded-key aggregation over the canonicalized
    corpus (full hash-match oracle)."""
    canon = canonicalize_urls(_docs_with_urls(spark, sf_dir))
    return domain_stats(canon).orderBy("registered_domain")


@query(
    "web_domain_quality_join",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, {SYNTH_HOST_SQL} AS u_host FROM documents
    ),
    u AS (
      SELECT d.doc_id, d.source, d.n_chars, {SYNTH_URL_SQL} AS url
      FROM u0 JOIN documents d USING (doc_id)
    ),
    {_CANON_SQL},
    dq AS (
      SELECT registered_domain,
             CASE WHEN CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       >= 300 THEN 'high'
                  WHEN CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       >= 200 THEN 'mid'
                  ELSE 'low' END AS quality_tier
      FROM canon GROUP BY registered_domain
    )
    SELECT c.source, dq.quality_tier,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM canon c JOIN dq USING (registered_domain)
    GROUP BY c.source, dq.quality_tier
    ORDER BY c.source, dq.quality_tier
    """,
)
def q_web_domain_quality_join(spark, sf_dir):
    """Join the domain-level quality tier BACK onto documents and
    cross-tabulate by source — the filter/downsample driver of the
    curation stage. The domain table is broadcast by construction
    (domains ≪ documents), so the join adds no corpus shuffle; the
    final (source, tier) aggregation is bounded-key."""
    canon = canonicalize_urls(_docs_with_urls(spark, sf_dir))
    tiers = domain_stats(canon).select("registered_domain", "quality_tier")
    return (
        canon.join(F.broadcast(tiers), "registered_domain")
        .groupBy("source", "quality_tier")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "quality_tier")
    )


def dedup_by_canonical_url(
    canon: DataFrame, id_col: str = "doc_id", quality_col: str = "n_chars"
) -> DataFrame:
    """URL-level dedup — the crawl stage BEFORE content dedup: the
    same page fetched many times (mirrors, recrawls, tracking-param
    variants) collapses to one representative per `url_canonical`,
    keeping the highest-quality fetch (quality desc, id asc — fully
    deterministic). Returns one row per canonical URL with the kept
    doc and the duplicate count.

    Scale shape: ONE hash-partitioned window on url_canonical (the
    `dedup.latest_wins` shape) — no join, no second scan; at 100 TB
    the canonical URL is also the natural bucketing key for the
    downstream store."""
    from pyspark.sql import Window

    w = Window.partitionBy("url_canonical").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        canon.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_fetches", F.count("*").over(Window.partitionBy("url_canonical"))
        )
        .filter(F.col("_rn") == 1)
        .select(
            "url_canonical",
            F.col(id_col).alias("kept_doc_id"),
            F.col(quality_col).alias("kept_quality"),
            F.col("n_fetches").cast("long").alias("n_fetches"),
        )
    )


#: recrawl-shaped fixture: the canonical key space is (site: d%7,
#: page: d%5) — period 35, so even the 50-doc sf0.001 fixture carries
#: real collisions, and larger SFs pile ~N/35 fetches onto each
#: canonical URL. The VARIANTS the canonicalization must collapse stay
#: rich: www-prefix (d%3), uppercase host+scheme (d%11), utm param
#: (odd d), fragment (d%6), trailing slash (d%4).
def _synth_recrawl_url(doc_id: Column, source: Column) -> Column:
    d = doc_id
    page = d % 5
    site = F.element_at(F.array(*[F.lit(s) for s in _SITES]), (d % 7 + 1).cast("int"))
    host = F.concat(
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        site,
        F.lit(".com"),
    )
    host = F.when(d % 11 == 0, F.upper(host)).otherwise(host)
    scheme = F.when(d % 11 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    path = F.concat(
        F.lit("/articles/item-"),
        page.cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    qry = F.concat(
        F.lit("?"),
        F.when(d % 2 == 1, F.lit("utm_source=feed&")).otherwise(F.lit("")),
        F.lit("page="),
        page.cast("string"),
    )
    frag = F.when(d % 6 == 0, F.lit("#top")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qry, frag)


_RECRAWL_URL_SQL = """
    (CASE WHEN doc_id % 11 = 0 THEN 'HTTPS' ELSE 'https' END)
    || '://'
    || (CASE WHEN doc_id % 11 = 0 THEN upper(u_host) ELSE u_host END)
    || '/articles/item-' || CAST(doc_id % 5 AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
    || '?'
    || (CASE WHEN doc_id % 2 = 1 THEN 'utm_source=feed&' ELSE '' END)
    || 'page=' || CAST(doc_id % 5 AS VARCHAR)
    || (CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END)
"""


@query(
    "web_url_dedup",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
             || (['news','blog','docs','wiki','shop','forum','cdn'])
                [(doc_id % 7) + 1]
             || '.com' AS u_host
      FROM documents
    ),
    u AS (
      SELECT d.doc_id, d.n_chars, {_RECRAWL_URL_SQL} AS url
      FROM u0 JOIN documents d USING (doc_id)
    ),
    {_CANON_SQL},
    ranked AS (
      SELECT url_canonical, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY url_canonical
               ORDER BY n_chars DESC, doc_id ASC
             ) AS rn,
             count(*) OVER (PARTITION BY url_canonical) AS n_fetches
      FROM canon
    )
    SELECT url_canonical,
           CAST(doc_id AS BIGINT) AS kept_doc_id,
           CAST(n_chars AS BIGINT) AS kept_quality,
           CAST(n_fetches AS BIGINT) AS n_fetches
    FROM ranked WHERE rn = 1
    ORDER BY url_canonical
    """,
)
def q_web_url_dedup(spark, sf_dir):
    """Canonical-URL dedup over a recrawl-shaped fixture (the same
    page id fetched under tracking-param/fragment/case variants):
    canonicalization collapses the variants, one window keeps the
    highest-quality fetch per canonical URL. The crawl-side stage that
    runs BEFORE content dedup. Full hash-match oracle."""
    docs = load_table(spark, sf_dir, "documents")
    canon = canonicalize_urls(
        docs.withColumn(
            "url", _synth_recrawl_url(F.col("doc_id"), F.col("source"))
        )
    )
    return dedup_by_canonical_url(canon)
