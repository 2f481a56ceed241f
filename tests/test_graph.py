"""Connected components on hand-built graphs: a long chain (multiple
alternating rounds required), disjoint cliques, and singleton handling
through dedup_clusters."""

from __future__ import annotations

from dynamodb_to_datalake_project_spark.graph import connected_components, dedup_clusters


def test_cc_chain_and_cliques(spark):
    # chain 0-1-2-...-9 (component min 0), triangle 100-101-102,
    # isolated edge 200-201
    edges = (
        [(i, i + 1) for i in range(9)]
        + [(100, 101), (101, 102), (100, 102)]
        + [(201, 200)]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "a", "b").collect()
    }
    assert got == (
        {i: 0 for i in range(10)}
        | {100: 100, 101: 100, 102: 100}
        | {200: 200, 201: 200}
    )


def test_dedup_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "a_id long, b_id long")
    rows = dedup_clusters(docs, pairs, "doc_id", "a_id", "b_id").collect()
    by_doc = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}
    assert by_doc == {
        0: (0, 1), 2: (2, 1), 4: (4, 1),
        1: (1, 3), 3: (1, 3), 5: (1, 3),
    }
