"""k-means training (llm/cluster.py): recovery of separated clusters,
monotone inertia, determinism under re-run, and the map-only shape of
the assignment stage."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.llm.cluster import (
    _literal_centroids,
    _nearest_cid,
    kmeans_train,
)
from dynamodb_to_datalake_project_spark.llm.similarity import (
    as_double_vec,
    assign_centroids,
)


def _blobs(spark, centers, n_per, spread=0.05):
    """Deterministic 'blobs': points on a small fixed lattice around
    each center (no RNG — the tests must be retry-stable)."""
    rows = []
    vid = 0
    for c in centers:
        for i in range(n_per):
            # distinct offset per point so no two vectors are ever
            # equal (duplicate seeds would merge clusters by design)
            off = spread * (i - n_per / 2.0) / n_per
            rows.append((vid, [c[0] + off, c[1] - off]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_separated_blobs(spark):
    emb = _blobs(spark, [(0.0, 0.0), (10.0, 10.0)], n_per=20)
    cents, sizes = kmeans_train(emb, k=2, n_iters=3)
    assert sorted(sizes.values()) == [20, 20]
    got = sorted(tuple(v) for _, v in cents)
    # each trained centroid sits on its blob's exact mean (the lattice
    # offsets average to -spread/20 per coordinate pair construction)
    for (gx, gy), (cx, cy) in zip(got, [(0.0, 0.0), (10.0, 10.0)]):
        assert abs(gx - cx) < 0.3 and abs(gy - cy) < 0.3


def test_kmeans_inertia_nonincreasing(spark):
    emb = _blobs(spark, [(0.0, 0.0), (4.0, 1.0), (1.0, 5.0)], n_per=15)

    def inertia(cents):
        cdf = spark.createDataFrame(
            [(cid, v) for cid, v in cents], "cid long, cv array<double>"
        )
        return (
            assign_centroids(emb, cdf)
            .agg(F.sum("d2").alias("i"))
            .collect()[0]["i"]
        )

    vals = [
        inertia(kmeans_train(emb, k=3, n_iters=t)[0]) for t in (1, 2, 3)
    ]
    assert vals[0] >= vals[1] - 1e-9 and vals[1] >= vals[2] - 1e-9


def test_kmeans_deterministic_rerun(spark):
    emb = _blobs(spark, [(0.0, 0.0), (3.0, 3.0)], n_per=12, spread=0.5)
    a = kmeans_train(emb, k=2, n_iters=2)
    b = kmeans_train(emb, k=2, n_iters=2)
    assert a == b  # bit-identical, not approximately equal


def test_kmeans_assignment_stage_is_map_only(spark):
    """The 100 TB property: assigning the corpus against literal
    centroids must not shuffle the corpus — the only exchange in the
    stats plan is the k*d-bounded partial-agg exchange."""
    emb = _blobs(spark, [(0.0, 0.0), (2.0, 2.0)], n_per=10)
    cents = [(0, [0.0, 0.0]), (1, [2.0, 2.0])]
    assigned = emb.select(
        _nearest_cid(_literal_centroids(cents), as_double_vec(F.col("embedding"))).alias("cid"),
        F.col("embedding").alias("v"),
    )
    stats = (
        assigned.select("cid", F.posexplode("v").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.sum(F.col("val").cast("decimal(20,9)")).alias("s"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        stats.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("+- Exchange") == 1, plan  # one exchange in the tree
    assert "Join" not in plan, plan
    # map-side combine present below the single exchange
    assert "partial_sum" in plan, plan


def test_kmeans_rejects_bad_inputs(spark):
    import pytest as _pt

    emb = _blobs(spark, [(0.0, 0.0)], n_per=3)
    with _pt.raises(ValueError, match="k >= 1"):
        kmeans_train(emb, k=0, n_iters=1)
    with _pt.raises(ValueError, match="n_iters >= 1"):
        kmeans_train(emb, k=2, n_iters=0)
    empty = emb.filter("vec_id < 0")
    with _pt.raises(ValueError, match="empty embeddings"):
        kmeans_train(empty, k=2, n_iters=1)


def test_maximin_seeds_spread(spark):
    """Farthest-first must pick one seed per separated blob (md5 init
    can land several seeds in one blob; maximin by construction cannot
    while empty blobs remain)."""
    from dynamodb_to_datalake_project_spark.llm.cluster import maximin_seeds

    centers = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    emb = _blobs(spark, centers, n_per=10)
    e = emb.selectExpr("vec_id as id", "embedding as v")
    seeds = maximin_seeds(e, k=3)
    homes = set()
    for _, vec in seeds:
        homes.add(min(range(3), key=lambda i: (vec[0] - centers[i][0]) ** 2
                      + (vec[1] - centers[i][1]) ** 2))
    assert homes == {0, 1, 2}


def test_kmeans_maximin_recovers_blobs(spark):
    emb = _blobs(spark, [(0.0, 0.0), (8.0, 8.0), (8.0, -8.0)], n_per=10)
    cents, sizes = kmeans_train(emb, k=3, n_iters=2, init="maximin")
    assert sorted(sizes.values()) == [10, 10, 10]


def test_silhouette_separated_vs_split(spark):
    """Simplified silhouette must score a clean 2-blob clustering near
    1 and stay within [-1, 1] everywhere."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES  # noqa: F401
    from dynamodb_to_datalake_project_spark.llm.cluster import (
        kmeans_train,
        _literal_centroids,
    )
    from pyspark.sql import functions as F  # noqa: F811

    emb = _blobs(spark, [(0.0, 0.0), (20.0, 20.0)], n_per=15, spread=0.2)
    cents, _ = kmeans_train(emb, k=2, n_iters=2)
    lits = _literal_centroids(cents)
    e = emb.selectExpr("vec_id", "embedding as v")
    d2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    ranked = F.array_sort(F.transform(
        lits, lambda c: F.struct(F.sqrt(d2(c["cv"])).alias("dist"),
                                 c["cid"].alias("cid"))))
    rows = e.select(
        ((ranked[1]["dist"] - ranked[0]["dist"])
         / F.greatest(ranked[0]["dist"], ranked[1]["dist"])).alias("s")
    ).collect()
    vals = [r["s"] for r in rows]
    assert all(-1.0 <= v <= 1.0 for v in vals)
    assert min(vals) > 0.9  # tight blobs, far apart -> near-perfect score


def test_kmeans_packed_path_matches_literal(spark, monkeypatch):
    """Above _LITERAL_LIMIT the assignment switches from plan literals
    to a broadcast packed table; both must be BIT-identical (same
    nearest_centroid fold on the same doubles)."""
    import dynamodb_to_datalake_project_spark.llm.cluster as C

    emb = _blobs(spark, [(0.0, 0.0), (5.0, 5.0), (5.0, -5.0)], n_per=8)
    lit = kmeans_train(emb, k=3, n_iters=2)
    monkeypatch.setattr(C, "_LITERAL_LIMIT", 0)
    packed = kmeans_train(emb, k=3, n_iters=2)
    assert lit == packed


def test_ivf_trained_recall_against_bruteforce(spark):
    """The lossy trained-cell IVF (probe 2/8) must recover a
    meaningful fraction of the exact top-5 — the oracle proves the
    pipeline is computed as specified; this pins that the
    SPECIFICATION itself has useful recall."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        as_double_vec,
        knn_bruteforce,
    )
    from pyspark.sql import functions as F  # noqa: F811

    load_all()
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    e = emb.select("vec_id", as_double_vec("embedding").alias("v"))
    exact = knn_bruteforce(
        e.filter(F.col("vec_id") < 8), e.filter(F.col("vec_id") >= 8), k=5
    ).collect()
    approx = QUERIES["sim_ann_ivf_trained"](spark, sf).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, (recall,)
    assert all(r.query_id < 8 and r.neighbor_id >= 8 for r in approx)


def test_kmeans_require_k_rejects_truncated_maximin(spark):
    import pytest as _pt

    # 3 distinct vectors cannot seed k=4 by farthest-first traversal;
    # the oracle CTEs don't replay truncation, so require_k (which
    # every oracle-facing config sets) must raise a clear error
    # instead of letting the gate fail with a hash mismatch
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)] + [(3, [2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with _pt.raises(ValueError, match="truncated"):
        kmeans_train(emb, k=4, n_iters=1, init="maximin", require_k=True)
    # without require_k the documented truncation behavior stands
    cents, _ = kmeans_train(emb, k=4, n_iters=1, init="maximin")
    assert 1 <= len(cents) <= 3


def test_parallel_seeds_recovers_blobs(spark):
    from dynamodb_to_datalake_project_spark.llm.cluster import parallel_seeds

    emb = _blobs(spark, [(0.0, 0.0), (10.0, 10.0), (0.0, 10.0)], n_per=20)
    cents, sizes = kmeans_train(emb, k=3, n_iters=3, init="parallel")
    assert sorted(sizes.values()) == [20, 20, 20]
    got = sorted(tuple(v) for _, v in cents)
    for (gx, gy), (cx, cy) in zip(got, [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0)]):
        assert abs(gx - cx) < 0.3 and abs(gy - cy) < 0.3
    # the raw seeds themselves are spread out: one per blob (weighted
    # greedy k-center cannot put two picks in the same tight blob
    # while a 10-apart blob has candidates)
    norm = emb.select(
        F.col("vec_id").alias("id"), as_double_vec("embedding").alias("v")
    )
    seeds = parallel_seeds(norm, k=3)
    blobs = {
        (round(v[0] / 10.0), round(v[1] / 10.0)) for _, v in seeds
    }
    assert len(blobs) == 3


def test_parallel_seeds_deterministic_rerun(spark):
    from dynamodb_to_datalake_project_spark.llm.cluster import parallel_seeds

    emb = _blobs(spark, [(0.0, 0.0), (5.0, 1.0), (2.0, 7.0)], n_per=12)
    norm = emb.select(
        F.col("vec_id").alias("id"), as_double_vec("embedding").alias("v")
    )
    a = parallel_seeds(norm.repartition(7), k=4)
    b = parallel_seeds(norm.repartition(2), k=4)
    assert a == b  # bit-identical regardless of partitioning


def test_arrow_exact_fold_bit_identical_to_literal_plan(spark):
    """The Arrow fast path inside parallel_seeds must reproduce the
    literal Catalyst fold BIT-FOR-BIT — min-d² values AND the
    strict-< first-wins nearest position — on real fixture vectors
    (the determinism contract the md5 coin and the DuckDB oracle
    depend on). numpy's reassociating `((v-c)**2).sum(axis=1)` would
    NOT pass this test; the dim-order loop does."""
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.cluster import (
        _arrow_min_d2,
        _arrow_nearest_pos,
        _literal_centroids,
    )
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        nearest_centroid,
        sq_dist,
    )
    from tests.conftest import SF_DIR

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select(F.col("vec_id").alias("id"), as_double_vec("embedding").alias("v"))
        .localCheckpoint(eager=True)
    )
    cands = [
        [float(x) for x in r["v"]]
        for r in emb.orderBy("id").limit(17).collect()
    ]
    lits = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cands])
    lit_m = {
        r["id"]: r["m"]
        for r in emb.select(
            "id",
            F.array_min(
                F.transform(lits, lambda c: sq_dist(F.col("v"), c))
            ).alias("m"),
        ).collect()
    }
    arrow_m = {r["id"]: r["m"] for r in _arrow_min_d2(emb, cands).collect()}
    assert arrow_m == lit_m  # exact ==, not approx

    lits_struct = _literal_centroids(list(enumerate(cands)))
    lit_pos = {
        r["id"]: r["pos"]
        for r in emb.select(
            "id", nearest_centroid(lits_struct, F.col("v"))["cid"].alias("pos")
        ).collect()
    }
    # _arrow_nearest_pos returns positions only; pair through a zip on
    # the deterministic id order instead
    import pandas as _pd  # noqa: F401

    arrow_rows = (
        _arrow_nearest_pos(emb.orderBy("id").coalesce(1), cands)
        .collect()
    )
    ordered_ids = [r["id"] for r in emb.orderBy("id").collect()]
    assert {i: r["pos"] for i, r in zip(ordered_ids, arrow_rows)} == lit_pos


def test_parallel_seeds_rejects_bad_inputs(spark):
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.cluster import parallel_seeds

    emb = _blobs(spark, [(0.0, 0.0)], n_per=3)
    norm = emb.select(
        F.col("vec_id").alias("id"), as_double_vec("embedding").alias("v")
    )
    with _pt.raises(ValueError, match="k, l, rounds >= 1"):
        parallel_seeds(norm, k=0)
    with _pt.raises(ValueError, match="empty embeddings"):
        parallel_seeds(norm.filter("id < 0"), k=2)
