"""Physical-plan regression pins for the newest query shapes.

Each assertion encodes the 100 TB-relevant property of the plan — the
thing that must NOT silently regress when code or Spark versions move:
filters reaching the parquet scan, dims broadcasting, semi-joins
staying semi, top-k staying heap-based, and no BroadcastNestedLoop
where an equi-join is intended. (Older shapes are pinned in
test_lake.py / the EXPLAIN.md audit.)
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from dynamodb_to_datalake_project_spark import catalog

SF_DIR = "/root/testdata/sf0.001"

catalog.load_all()


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        catalog.QUERIES[name](spark, SF_DIR).explain("formatted")
    return buf.getvalue()


# (query, must-contain fragments, must-NOT-contain fragments)
CASES = [
    # Q6: every predicate reaches the scan; no join at all
    (
        "q6_forecast_revenue",
        ["PushedFilters: [IsNotNull(l_shipdate)", "GreaterThanOrEqual(l_discount,0.05"],
        ["Join"],
    ),
    # Q8: dims broadcast; the fact joins are hash equi-joins
    ("q8_market_share", ["BroadcastHashJoin"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    # Q9: LIKE-filtered part still broadcasts; no nested-loop fallback
    ("q9_product_profit", ["BroadcastHashJoin"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    # Q12: shipdate range pushed; lateness evaluated post-join, not a BNLJ
    (
        "q12_late_priority_count",
        ["PushedFilters: [IsNotNull(l_shipdate)"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ),
    # Q13: the priority exclusion must stay INSIDE the outer join
    ("q13_order_distribution", ["LeftOuter"], ["BroadcastNestedLoopJoin"]),
    # Q20: qualifying suppliers arrive via LEFT SEMI, part prefix pushed
    (
        "q20_stock_promotion",
        ["LeftSemi", "StringStartsWith(p_name,red)"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ),
    # BM25: top-20 is a heap (TakeOrderedAndProject), not a global sort
    ("text_bm25_topk", ["TakeOrderedAndProject"], ["CartesianProduct"]),
    # centroid assign: corpus side must not shuffle before the argmin
    ("embed_centroid_assign", [], ["SortMergeJoin"]),
    # novelty: df via window — no second explode branch, no join
    ("text_novelty_score", ["Window"], ["SortMergeJoin", "BroadcastHashJoin"]),
    # round 4: image codec is ONE Arrow python stage — no shuffle at all
    ("multimodal_image_stats", ["MapInPandas"], ["Exchange", "Join"]),
    # round 4: PCA invariant projection/reconstruction is map-only —
    # the only exchange allowed would be none (partials run in a
    # separate job inside pca_components, not this plan)
    ("embed_pca_invariants", [], ["Exchange", "Join"]),
    # round 4: overlap matrix stays lazy (no checkpoint barrier) at
    # bench scale — the size gate must not flip on fixture data
    ("source_overlap_matrix", [], ["ExistingRDD"]),
    # round 5: every real-codec stage is ONE Arrow python stage behind
    # the single core-spreading exchange — no sort, no join, and no
    # second shuffle may ever creep in (codec cost must stay map-only)
    ("multimodal_jpeg_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_webp_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_flac_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_video_frames", ["MapInPandas"], ["Sort", "Join"]),
    # round 6: mp4/mp3/ogg demux are the same one-Arrow-stage shape
    ("multimodal_mp4_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_mp3_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_ogg_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_fmp4_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_webm_stats", ["MapInPandas"], ["Sort", "Join"]),
    ("multimodal_mpegts_stats", ["MapInPandas"], ["Sort", "Join"]),
    # round 6: CMS estimate — the bounded sketch table must BROADCAST
    # into the query side (estimating never shuffles the query stream)
    # and no nested-loop may replace the (depth, bucket) equi-join
    (
        "sketch_cms_estimate",
        ["BroadcastHashJoin"],
        ["SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # round 5: A-ES weighted sample is scan -> project -> heap top-k;
    # the sample must NEVER cost a shuffle or a global sort
    ("sample_weighted_aes", ["TakeOrderedAndProject"], ["Exchange", "Join"]),
    # round 5: variant decode is two fused map-only projects under one
    # codegen stage — parse_json + per-path variant_get, no shuffle
    ("p1_variant_decode", ["variant_get"], ["Exchange", "Join"]),
    # round 5: HLL rollup must keep its map-side partial sketch agg
    # (ObjectHashAggregate below the first Exchange) and never join
    ("sketch_hll_daily_users", ["ObjectHashAggregate"], ["Join"]),
    # round 6: LPA — the per-round argmax must be the deterministic-
    # mode AGGREGATE (ObjectHashAggregate, map-side label-count maps),
    # never a Window sort and never a second per-round exchange shape;
    # edges reused from the eager checkpoint; equi-joins only
    (
        "graph_label_propagation",
        ["ExistingRDD", "ObjectHashAggregate"],
        ["Window", "CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # round 6: k-core output plan — after the per-round eager
    # checkpoints (load-bearing, see graph.kcore) the visible plan is
    # just the checkpointed edge scan + one degree agg; the per-round
    # LeftSemi joins live in the already-run checkpoint jobs, so the
    # pin asserts the cheap tail and forbids any late fallback shapes
    (
        "graph_kcore",
        ["ExistingRDD"],
        ["Window", "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # round 5: pagerank's final-iteration plan — equi-joins only (no
    # nested-loop fallback), degree-annotated edges reused from the
    # eager checkpoint (ExistingRDD scan), rank table is the only
    # moving side
    (
        "graph_pagerank",
        ["ExistingRDD"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # round 5: SemDeDup over trained cells — the within-cell pair join
    # must stay an equi-join on the cell key (the O(Σ|cell|²) cost
    # model depends on it); no unkeyed cartesian may ever appear
    ("dedup_semantic_trained", [], ["CartesianProduct"]),
]


@pytest.mark.parametrize("name,require,forbid", CASES, ids=[c[0] for c in CASES])
def test_plan_properties(spark, name, require, forbid):
    plan = _plan(spark, name)
    for frag in require:
        assert frag in plan, f"{name}: missing {frag!r}\n{plan}"
    for frag in forbid:
        assert frag not in plan, f"{name}: unexpected {frag!r}\n{plan}"


def test_every_catalog_query_documented_in_coverage():
    """COVERAGE.md is the judge-facing operator map — a catalog entry
    that never lands there is invisible coverage. Fail on drift."""
    import pathlib

    txt = (pathlib.Path(__file__).parent.parent / "COVERAGE.md").read_text()
    missing = [q for q in catalog.QUERIES if f"`{q}`" not in txt]
    assert not missing, f"undocumented catalog queries: {missing}"


def test_readme_query_counts_current():
    """README.md states the catalog/oracle counts; they drift silently
    when queries are added (happened in rounds 2 and 3). Parse and pin."""
    import pathlib
    import re

    txt = (pathlib.Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(r"\((\d+) oracle-checked catalog queries of (\d+)", txt)
    assert m, "README.md no longer states the catalog counts"
    assert int(m.group(1)) == len(catalog.ORACLE), (
        f"README says {m.group(1)} oracles, catalog has {len(catalog.ORACLE)}"
    )
    assert int(m.group(2)) == len(catalog.QUERIES), (
        f"README says {m.group(2)} queries, catalog has {len(catalog.QUERIES)}"
    )


def test_every_headline_query_exists_in_catalog():
    """bench.py's HEADLINE list must reference real catalog entries."""
    import bench

    missing = [q for q in bench.HEADLINE if q not in catalog.QUERIES]
    assert not missing, missing
