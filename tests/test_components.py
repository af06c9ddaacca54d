"""Connected components: large-star/small-star vs a pure-python union-find."""

import numpy as np
from pyspark.sql import functions as F

from takco_spark.operators.components import (
    attach_labels,
    connected_components,
    rechunk_oversized,
)


def union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, label by component min
    comp = {}
    for i in range(n_nodes):
        r = find(i)
        comp.setdefault(r, []).append(i)
    label = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            label[x] = m
    return label


def _ids(i):
    return f"d{i:04d}"


def test_cc_matches_union_find_random_graph(spark):
    rng = np.random.RandomState(11)
    n = 200
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(300, 2)) if a != b]
    expected = union_find(n, edges)

    df = spark.createDataFrame(
        [( _ids(a), _ids(b)) for a, b in edges], ["src", "dst"]
    )
    res = connected_components(df, max_iterations=20)
    assert res.converged
    got = {r["doc_id"]: r["cluster_id"] for r in res.labels.collect()}
    # nodes that appear in edges must be labelled with their component min
    touched = {x for e in edges for x in e}
    assert set(got) == {_ids(i) for i in touched}
    for i in touched:
        assert got[_ids(i)] == _ids(expected[i]), i


def test_cc_chain_and_singletons(spark):
    # a 6-node path — worst case for naive propagation
    edges = [(f"d{i:03d}", f"d{i+1:03d}") for i in range(6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    res = connected_components(df)
    got = {r["doc_id"]: r["cluster_id"] for r in res.labels.collect()}
    assert set(got.values()) == {"d000"}
    assert len(got) == 7


def test_attach_labels_singletons(spark):
    docs = spark.createDataFrame(
        [("a", [],), ("b", []), ("c", [])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    labels = spark.createDataFrame([("a", "a"), ("b", "a")], ["doc_id", "cluster_id"])
    out = attach_labels(docs, labels)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_rechunk_oversized(spark):
    labels = spark.createDataFrame(
        [(f"d{i:03d}", "c0") for i in range(10)] + [("x1", "c1"), ("x2", "c1")],
        ["doc_id", "cluster_id"],
    )
    out = rechunk_oversized(labels, max_cluster_size=4)
    sizes = {r["cluster_id"]: r["n"] for r in
             out.groupBy("cluster_id").count().withColumnRenamed("count", "n").collect()}
    assert all(n <= 4 for n in sizes.values())
    assert sizes["c1"] == 2  # small cluster untouched
    assert sum(n for c, n in sizes.items() if c.startswith("c0#")) == 10


# --- G1 parity: CC(+refine) vs reference-style Louvain -----------------------
# (the sequential Louvain oracle was promoted to a first-class operator in
# round 5 — operators/louvain.py; this test keeps using it as the semantic
# reference for the CC+refine substitution)

from takco_spark.operators.louvain import louvain_partition as _louvain


def test_cc_refine_matches_louvain_wikitables_regime(spark):
    """Measured parity for the G1 substitution (VERDICT r3 task 9): on a
    planted-partition graph at the wikitables threshold regime
    (agg_threshold 0.98, edge_exp 6), with 8 spurious single-edge bridges
    between dense planted clusters:

    - raw CC merges ALL bridged pairs        -> F1 vs Louvain 0.840, vs planted 0.719
    - CC + G3 refine cuts ALL bridges        -> F1 vs Louvain 0.874, vs planted 1.000
    - Louvain itself merges 4 of 8 bridges (the classic resolution limit),
      which is the entire residual CC+refine <-> Louvain gap.

    So the substitution moves toward Louvain AND recovers the planted truth
    exactly where Louvain does not; numbers pinned below and documented in
    COVERAGE.md (G1)."""
    import random

    from takco_spark.operators.refine import refine_clusters
    from takco_spark.plans.metrics import pairwise_f1

    rng = random.Random(11)
    edge_sims = {}
    clusters = []
    for c in range(25):
        size = rng.randint(4, 8)
        members = [f"n{c:02d}_{i}" for i in range(size)]
        clusters.append(members)
        for i in range(size):
            for j in range(i + 1, size):
                edge_sims[(members[i], members[j])] = 0.985 + 0.015 * rng.random()
    # 8 single-edge bridges between otherwise-dense planted clusters, with
    # sims just above the 0.98 threshold: CC must over-merge these
    for c in range(0, 16, 2):
        u = rng.choice(clusters[c])
        v = rng.choice(clusters[c + 1])
        edge_sims[(u, v)] = 0.980 + 0.004 * rng.random()

    louvain_com = _louvain(edge_sims, edge_exp=6)
    louvain_df = spark.createDataFrame(
        [(n, str(c)) for n, c in louvain_com.items()],
        "doc_id string, true_entity string")

    edges = spark.createDataFrame(
        [(u, v) for (u, v) in edge_sims], "src string, dst string")
    cc = connected_components(edges)
    assert cc.converged

    sims_df = spark.createDataFrame(
        [(u, v, s) for (u, v), s in edge_sims.items()],
        "doc_id_1 string, doc_id_2 string, agg_sim double")
    refined = refine_clusters(cc.labels, sims_df, threshold=0.98)

    f1_cc = pairwise_f1(cc.labels, louvain_df).f1
    f1_refined = pairwise_f1(
        refined.select("doc_id", F.col("refined_id").alias("cluster_id")),
        louvain_df).f1

    planted_df = spark.createDataFrame(
        [(n, str(ci)) for ci, ms in enumerate(clusters) for n in ms],
        "doc_id string, true_entity string")
    f1_cc_planted = pairwise_f1(cc.labels, planted_df).f1
    f1_refined_planted = pairwise_f1(
        refined.select("doc_id", F.col("refined_id").alias("cluster_id")),
        planted_df).f1

    # Louvain never SPLITS a planted cluster; its only divergence from the
    # planted truth is resolution-limit merges of bridged pairs
    planted = {n: str(ci) for ci, ms in enumerate(clusters) for n in ms}
    lv_groups = {}
    for n, c in louvain_com.items():
        lv_groups.setdefault(c, set()).add(planted[n])
    by_planted = {}
    for n, c in louvain_com.items():
        by_planted.setdefault(planted[n], set()).add(c)
    assert all(len(cs) == 1 for cs in by_planted.values())
    n_merged = sum(1 for g in lv_groups.values() if len(g) > 1)
    assert 0 < n_merged < 8  # resolution limit: merges some, not all, bridges

    # pinned measurements (see docstring)
    assert f1_refined_planted == 1.0
    assert f1_cc_planted < 0.8
    assert f1_refined > f1_cc  # refine moves CC toward Louvain
    assert 0.83 < f1_cc < 0.86
    assert 0.86 < f1_refined < 0.89


def test_cc_star_forest_input_converges_in_one_round(spark):
    # the convergence test is the DIRECT star-forest property (r6): an input
    # that is already a depth-1 star forest must be detected at round 1 —
    # the r5 compare-consecutive-checksums protocol always paid one more
    # confirming round — with labels identical to the fixed-point shortcut.
    edges = [("d001", "d000"), ("d002", "d000"), ("d005", "d004")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    res = connected_components(df)
    assert res.converged
    assert res.iterations == 1
    got = {r["doc_id"]: r["cluster_id"] for r in res.labels.collect()}
    assert got == {
        "d000": "d000", "d001": "d000", "d002": "d000",
        "d004": "d004", "d005": "d004",
    }


def test_cc_non_star_detection_never_early_exits_wrongly(spark):
    # two triangles sharing no nodes plus a 4-chain: needs real rounds; the
    # star test must only fire once the set is a genuine depth-1 forest
    edges = [
        ("d001", "d000"), ("d002", "d001"), ("d002", "d000"),
        ("d011", "d010"), ("d012", "d011"), ("d012", "d010"),
        ("d021", "d020"), ("d022", "d021"), ("d023", "d022"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    res = connected_components(df)
    assert res.converged
    got = {r["doc_id"]: r["cluster_id"] for r in res.labels.collect()}
    for i in (0, 1, 2):
        assert got[f"d00{i}"] == "d000"
        assert got[f"d01{i}"] == "d010"
    for i in (0, 1, 2, 3):
        assert got[f"d02{i}"] == "d020"
