"""URL canonicalization / domain curation (`llm/web.py`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_canonicalize_urls_branches(spark):
    """Every normalization branch on handcrafted URLs: case lowering,
    www-strip, multi-label public suffix, port extraction, duplicate
    slashes, /./ segments (including consecutive), trailing slash,
    tracking-param drop, query sort, fragment drop, no-query URLs."""
    from dynamodb_to_datalake_project_spark.llm.web import canonicalize_urls

    urls = [
        ("HTTPS://WWW.News-Src0.CO.UK:8080/a//b/./c/?utm_source=x&b=2&a=1#f",),
        ("http://eu.blog.com/x/././y/",),
        ("https://docs.org/p?gclid=1&fbclid=2&utm_campaign=3",),
        ("http://shop.de/q",),
    ]
    got = {
        r["url"]: r.asDict()
        for r in canonicalize_urls(
            spark.createDataFrame(urls, "url string")
        ).collect()
    }
    r = got[urls[0][0]]
    assert r["scheme"] == "https"
    assert r["host"] == "news-src0.co.uk"
    assert r["port"] == 8080
    assert r["registered_domain"] == "news-src0.co.uk"  # co.uk kept 3 labels
    assert r["path_norm"] == "/a/b/c"
    assert r["query_norm"] == "a=1&b=2"  # utm dropped, remainder sorted
    assert r["url_canonical"] == "https://news-src0.co.uk:8080/a/b/c?a=1&b=2"

    r = got[urls[1][0]]
    assert r["host"] == "eu.blog.com"  # eu. is a real subdomain, kept
    assert r["registered_domain"] == "blog.com"
    assert r["path_norm"] == "/x/y"  # consecutive /./ segments collapse
    assert r["port"] is None
    assert r["url_canonical"] == "http://eu.blog.com/x/y"

    r = got[urls[2][0]]
    assert r["query_norm"] == ""  # all params were tracking params
    assert r["url_canonical"] == "https://docs.org/p"

    r = got[urls[3][0]]
    assert r["registered_domain"] == "shop.de"
    assert r["path_norm"] == "/q"


def test_domain_quality_join_is_broadcast(spark):
    """The tier join back onto the corpus must not shuffle documents:
    the domain-sized build side broadcasts."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all

    load_all()
    plan = (
        QUERIES["web_domain_quality_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_domain_stats_tiers_partition_the_corpus(spark):
    """Tier counts over the join-back must add up to the corpus size
    (every document lands in exactly one domain tier)."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all
    from dynamodb_to_datalake_project_spark.lake import load_table

    load_all()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    rows = QUERIES["web_domain_quality_join"](spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["quality_tier"] for r in rows} <= {"high", "mid", "low"}


def test_synth_url_covers_all_branches(spark):
    """The fixture formula must exercise every canonicalization branch
    at fixture scale, or the oracle proves less than it claims."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all

    load_all()
    rows = QUERIES["web_url_canonicalize"](spark, SF_DIR).collect()
    assert any(r["port"] == 8080 for r in rows)
    assert any(r["port"] is None for r in rows)
    assert any(r["url"] != r["url"].lower() for r in rows)  # uppercased hosts
    assert any("www." in r["url"] for r in rows)
    assert all(not r["host"].startswith("www.") for r in rows)
    assert any(
        r["registered_domain"] != r["host"] for r in rows
    )  # eu. subdomains stripped by registered-domain extraction
    assert any(r["registered_domain"].endswith(".co.uk") for r in rows)
    assert any("//item" in r["url"] for r in rows)
    assert all("//item" not in r["path_norm"] for r in rows)
    assert any("utm_source" in r["url"] for r in rows)
    assert all("utm_" not in r["query_norm"] for r in rows)
    assert any("#sec" in r["url"] for r in rows)
    assert all("#" not in r["url_canonical"] for r in rows)
    assert all(
        not r["path_norm"].endswith("/") for r in rows
    )  # trailing slashes stripped (no root-path URLs in the fixture)


def test_url_dedup_collapses_variants(spark):
    """Tracking-param / fragment / case variants of one page collapse
    to a single canonical row keeping the highest-quality fetch (ties
    to lowest id), with the fetch count preserved."""
    from dynamodb_to_datalake_project_spark.llm.web import (
        canonicalize_urls,
        dedup_by_canonical_url,
    )

    rows = [
        (1, "https://www.a.com/p?utm_source=x&id=7", 100),
        (2, "HTTPS://A.COM/p?id=7#frag", 300),
        (3, "https://a.com/p/?id=7", 300),  # ties with 2 -> lowest id wins
        (4, "https://a.com/q?id=8", 50),
    ]
    canon = canonicalize_urls(
        spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    )
    got = {
        r["url_canonical"]: (r["kept_doc_id"], r["kept_quality"], r["n_fetches"])
        for r in dedup_by_canonical_url(canon).collect()
    }
    assert got == {
        "https://a.com/p?id=7": (2, 300, 3),
        "https://a.com/q?id=8": (4, 50, 1),
    }


def test_url_dedup_fixture_has_real_collisions(spark):
    """The recrawl fixture must actually exercise the dedup (every
    canonical URL carrying only one fetch would prove nothing)."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all
    from dynamodb_to_datalake_project_spark.lake import load_table
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["web_url_dedup"](spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_fetches"] for r in rows) == n_docs
    assert any(r["n_fetches"] > 1 for r in rows)
    assert len(rows) < n_docs


def test_html_extract_branches():
    """Pure-Python extractor branches: nested inline tags, named/
    decimal/hex entities, comments with fake tags, CDATA, script/style
    bodies with angle brackets, head/title handling, link-density
    drop, and malformed (unclosed) tags."""
    from dynamodb_to_datalake_project_spark.llm.web import (
        decode_html_entities,
        extract_main_content,
    )

    # entity decode: named, decimal, hex, unknown passthrough
    assert decode_html_entities("a&amp;b&lt;c&gt;d&#32;e&#x41;f&bogus;g") == (
        'a&b<c>d eAf&bogus;g'
    )

    d = extract_main_content(
        "<!DOCTYPE html><html><head><title>T &amp; t</title>"
        "<style>p { color: red; }</style>"
        "<script>if (a<b && c>d) { x('&'); }</script></head>"
        "<body><!-- <p>fake</p> & noise -->"
        "<p>This paragraph has <b><i>nested</i></b> inline tags and "
        "stays dense enough to keep for sure.</p>"
        "<ul><li><a href='/x'>x1</a></li><li><a href='/y'>y2</a></li></ul>"
        "<p>Entities: &lt;tag&gt; &amp; &#72;&#x49; inside content "
        "padding padding padding padding padding.</p>"
        "</body></html>"
    )
    assert d["title"] == "T & t"
    assert d["n_kept"] == 2
    # nested tags stripped, entities decoded, comment/script/style gone
    assert "nested inline tags" in d["extracted"]
    assert "<tag> & HI inside content" in d["extracted"]
    assert "fake" not in d["extracted"] and "color" not in d["extracted"]
    # the two 2-char nav links were dropped as boilerplate
    assert d["n_blocks"] == 4 and d["boilerplate_chars"] == 4

    # CDATA: content becomes text (tags inside NOT parsed), low-density
    # block dropped; high-density CDATA kept with brackets preserved
    d2 = extract_main_content(
        "<div><![CDATA[x<y&z]]></div>"
        "<p><![CDATA[kept cdata text with <angle> brackets & ampersands, "
        "long enough to clear the density threshold easily]]></p>"
    )
    assert d2["n_kept"] == 1 and "with <angle> brackets &" in d2["extracted"]
    assert d2["boilerplate_chars"] == 5

    # link-density rule: a long-but-link-heavy block is dropped even
    # though its char density is high
    d3 = extract_main_content(
        "<p><a href='/a'>this entire long paragraph is one giant anchor "
        "with plenty of characters</a></p>"
        "<p>plain dense paragraph that should be kept as main content "
        "without any anchors at all</p>"
    )
    assert d3["n_kept"] == 1 and d3["extracted"].startswith("plain dense")

    # malformed: unclosed tags never crash; text still extracted
    d4 = extract_main_content(
        "<p>unclosed paragraph with enough text to keep around here"
        "<div>another unclosed block also with plenty of text in it"
    )
    assert d4["n_kept"] == 2 and "unclosed paragraph" in d4["extracted"]


def test_html_extract_roundtrip_on_fixture(spark):
    """End-to-end over the parquet fixture through Spark: extraction
    recovers every document's text exactly (md5 equality) and the
    plan is a map-only scan (no shuffle except the spread
    repartition)."""
    import hashlib

    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all
    from dynamodb_to_datalake_project_spark.lake import load_table
    from tests.conftest import SF_DIR

    load_all()
    got = {
        r["doc_id"]: (r["extracted_md5"], r["n_kept"])
        for r in QUERIES["web_html_extract"](spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").collect()
    assert len(got) == len(docs)
    for r in docs:
        md5 = hashlib.md5(r["text"].encode()).hexdigest()
        assert got[r["doc_id"]][0] == md5
        assert got[r["doc_id"]][1] == (len(r["text"]) + 79) // 80


def test_robots_parsing_and_longest_match():
    """RFC 9309 branches: group assembly/merging, specific-vs-* group
    selection, wildcard and $ anchor matching, longest-match with
    allow-wins ties, empty Disallow, comments, unknown fields,
    Crawl-delay and file-wide Sitemap, malformed-line rejects."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.web import (
        parse_robots,
        robots_allowed,
        robots_match_len,
    )

    txt = (
        "# top comment\n"
        "User-agent: alpha\n"
        "User-agent: beta\n"
        "Disallow: /x/\n"
        "Allow: /x/pub  # carve-out\n"
        "Unknown-field: ignored\n"
        "\n"
        "Sitemap: https://e.com/s1.xml\n"
        "User-agent: beta\n"
        "Disallow: /y$\n"
        "Crawl-delay: 2.5\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    # beta merges BOTH its groups (RFC: all matching groups combine)
    r = parse_robots(txt, "BETA")
    assert r["rules"] == [(False, "/x/"), (True, "/x/pub"), (False, "/y$")]
    assert r["crawl_delay"] == 2.5 and r["sitemaps"] == ["https://e.com/s1.xml"]
    # alpha gets only the shared group
    assert parse_robots(txt, "alpha")["rules"][:2] == r["rules"][:2]
    # no specific group -> the * group applies
    assert parse_robots(txt, "gamma")["rules"] == [(False, "/")]

    # longest match + allow-wins tie + $ anchor
    assert robots_allowed(r["rules"], "/x/secret") == (False, 3)
    assert robots_allowed(r["rules"], "/x/public") == (True, 6)
    assert robots_allowed(r["rules"], "/y") == (False, 3)
    assert robots_allowed(r["rules"], "/yes") == (True, 0)  # $ blocked only /y
    assert robots_allowed([(True, "/a"), (False, "/a")], "/ab") == (True, 2)

    # wildcard/anchor matcher
    assert robots_match_len("/a*b$", "/a-x-b") == 5
    assert robots_match_len("/a*b$", "/a-x-bc") is None
    assert robots_match_len("/p*.html", "/p/q/r.html?x") == 8  # prefix after *
    assert robots_match_len("", "/anything") == 0

    # empty Disallow: is allow-everything (no rule recorded)
    assert parse_robots("User-agent: a\nDisallow:\n", "a")["rules"] == []

    with _pt.raises(ValueError, match="malformed line"):
        parse_robots("User-agent a\nDisallow /\n", "a")
    with _pt.raises(ValueError, match="bad crawl-delay"):
        parse_robots("User-agent: a\nCrawl-delay: soon\n", "a")


def test_warc_record_walk_and_rejects():
    """WARC goldens: framing round trip, member-gzip split, chunked
    dechunk equality, and the corrupt-archive quarantine paths."""
    import gzip

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import warc as W

    body = bytes(range(100))
    resp_plain = W.encode_http_response(200, "text/html", body)
    resp_chunk = W.encode_http_response(200, "text/html", body, chunked=True, chunk_size=7)
    # dechunked body equals the plain body exactly
    assert W.parse_http_response(resp_chunk)["body"] == body
    assert W.parse_http_response(resp_plain)["body"] == body

    records = [
        {"type": "warcinfo", "block": b"software: t\r\n"},
        {"type": "request", "uri": "https://e.com/", "block": b"GET / HTTP/1.1\r\n\r\n"},
        {"type": "response", "uri": "https://e.com/", "block": resp_chunk},
        {"type": "response", "uri": "https://e.com/2",
         "block": W.encode_http_response(404, "text/plain", b"gone")},
    ]
    raw = W.encode_warc(records)
    d = W.parse_warc(raw)
    assert d == {
        "n_records": 4, "has_warcinfo": 1, "n_requests": 1,
        "n_responses": 2, "n_200": 1, "n_html": 1, "chunked_responses": 1,
        "body_bytes": 104, "first_byte_sum": 0 + ord("g"),
    }
    # member-gzip: same stats through the split path
    bounds, at = [], 0
    for rec in records:
        at += len(W.encode_warc([rec]))
        bounds.append(at)
    gz = W.gzip_members(raw, bounds)
    assert W.parse_warc(gz, gzipped=True) == d
    assert len(W.split_gzip_members(gz)) == 4

    with _pt.raises(ValueError, match="bad version line"):
        W.parse_warc(b"WARC/2.0\r\n" + raw[10:])
    with _pt.raises(ValueError, match="missing Content-Length"):
        W.parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\nbody\r\n\r\n")
    with _pt.raises(ValueError, match="extends past end"):
        W.parse_warc(raw[:-10])
    with _pt.raises(ValueError, match="missing record separator"):
        corrupt = bytearray(raw)
        corrupt[len(W.encode_warc(records[:1])) - 2] = 0x58  # break first sep
        W.parse_warc(bytes(corrupt))
    with _pt.raises(ValueError, match="truncated gzip member"):
        W.parse_warc(gz[:-5], gzipped=True)
    with _pt.raises(ValueError, match="corrupt gzip member"):
        W.parse_warc(b"\x1f\x8b\x08\x00junkjunkjunk", gzipped=True)
    with _pt.raises(ValueError, match="bad chunk size"):
        W.decode_chunked(b"zz\r\nabc\r\n0\r\n\r\n")
    with _pt.raises(ValueError, match="chunk extends past end"):
        W.decode_chunked(b"ff\r\nshort\r\n0\r\n\r\n")
    with _pt.raises(ValueError, match="missing size line"):
        W.decode_chunked(b"5")
    with _pt.raises(ValueError, match="bad HTTP status line"):
        W.parse_http_response(b"NOPE\r\n\r\n")
    with _pt.raises(ValueError, match="no records"):
        W.parse_warc(b"")
    # gzip helper validates coverage
    with _pt.raises(ValueError, match="boundaries do not cover"):
        W.gzip_members(raw, bounds[:-1])


def test_sitemap_parsing_and_rejects():
    """Sitemap protocol branches: urlset vs sitemapindex, entity
    decode in <loc>, optional fields, and the validation rejects."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.web import parse_sitemap

    d = parse_sitemap(
        "<urlset><url><loc>https://e.com/?a=1&amp;b=2</loc>"
        "<lastmod>2024-01-02T03:04:05Z</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://e.com/bare</loc></url></urlset>"
    )
    assert d["kind"] == "urlset" and len(d["entries"]) == 2
    assert d["entries"][0]["loc"] == "https://e.com/?a=1&b=2"
    assert d["entries"][0]["priority"] == 0.8
    assert d["entries"][1] == {
        "loc": "https://e.com/bare", "lastmod": None,
        "changefreq": None, "priority": None,
    }
    idx = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    assert idx["kind"] == "sitemapindex" and len(idx["entries"]) == 1

    with _pt.raises(ValueError, match="no <urlset>"):
        parse_sitemap("<rss></rss>")
    with _pt.raises(ValueError, match="without <loc>"):
        parse_sitemap("<urlset><url><priority>0.5</priority></url></urlset>")
    with _pt.raises(ValueError, match="malformed lastmod"):
        parse_sitemap(
            "<urlset><url><loc>x</loc><lastmod>01/02/2024</lastmod>"
            "</url></urlset>"
        )
    with _pt.raises(ValueError, match="bad changefreq"):
        parse_sitemap(
            "<urlset><url><loc>x</loc><changefreq>often</changefreq>"
            "</url></urlset>"
        )
    with _pt.raises(ValueError, match="out of range"):
        parse_sitemap(
            "<urlset><url><loc>x</loc><priority>1.5</priority></url></urlset>"
        )
