"""Connected components: large-star/small-star vs a pure-python union-find."""

import numpy as np

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
