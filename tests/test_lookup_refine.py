"""Lookup joins (J6/J10/J11), cluster refinement (G3), novelty (A12)."""

import pytest
from pyspark.sql import functions as F

from takco_spark.operators import lookup, refine
from takco_spark.plans.metrics import novelty_counts


def test_surface_lookup_normalizes(spark):
    mentions = spark.createDataFrame(
        [("m1", "New_York"), ("m2", "new  york!"), ("m3", "Paris"), ("m4", "42")],
        ["mention_id", "text"],
    )
    lexicon = spark.createDataFrame(
        [("new york", "Q60", 0.9), ("paris", "Q90", 0.8)],
        ["surface", "entity", "score"],
    )
    out = lookup.surface_lookup(mentions, lexicon)
    got = {r["mention_id"]: r["entity"] for r in out.collect()}
    assert got["m1"] == "Q60" and got["m2"] == "Q60" and got["m3"] == "Q90"
    assert got["m4"] is None


def test_filter_lookupable_skips_numeric_short(spark):
    m = spark.createDataFrame(
        [("a", "Amsterdam"), ("b", "42"), ("c", "x"), ("d", "3.14"), ("e", "AB12")],
        ["id", "text"],
    )
    kept = {r["id"] for r in lookup.filter_lookupable(m).collect()}
    assert kept == {"a", "e"}


def test_known_empty_cache_split(spark):
    m = spark.createDataFrame(
        [("a", "foo"), ("b", "bar"), ("c", "baz")], ["id", "text"]
    )
    ke = spark.createDataFrame([("bar",)], ["surface"])
    to_lookup, skipped = lookup.with_known_empty_cache(m, ke)
    assert {r["id"] for r in to_lookup.collect()} == {"a", "c"}
    assert {r["id"] for r in skipped.collect()} == {"b"}


def test_class_candidate_join(spark):
    cols = spark.createDataFrame(
        [("c1", "Person", 0.9), ("c2", "Person", 0.8), ("c3", "City", 0.7)],
        ["col_id", "pred_class", "score"],
    )
    out = lookup.class_candidate_join(cols, cols).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["col_id_1"], r["col_id_2"]) == ("c1", "c2")
    assert r["class_sim"] == pytest.approx(0.9 * 0.8)


def test_refine_splits_weak_transitive_chain(spark):
    # CC merged a--b--c but a-c link is weak: complete linkage at 0.8 splits c
    labels = spark.createDataFrame(
        [("a", "k"), ("b", "k"), ("c", "k"), ("x", "solo")],
        ["doc_id", "cluster_id"],
    )
    sims = spark.createDataFrame(
        [("a", "b", 0.95), ("b", "c", 0.85), ("a", "c", 0.1)],
        ["doc_id_1", "doc_id_2", "agg_sim"],
    )
    out = refine.refine_clusters(labels, sims, threshold=0.8)
    got = {r["doc_id"]: r["refined_id"] for r in out.collect()}
    assert got["a"] == got["b"]          # strong pair stays together
    assert got["c"] != got["a"]          # weak completes-linkage → split
    assert got["x"].startswith("solo/")  # singleton cluster intact


def test_refine_forbids_same_source_links(spark):
    labels = spark.createDataFrame(
        [("a", "k", "s1"), ("b", "k", "s1"), ("c", "k", "s2")],
        ["doc_id", "cluster_id", "source"],
    )
    sims = spark.createDataFrame(
        [("a", "b", 0.99), ("a", "c", 0.9), ("b", "c", 0.9)],
        ["doc_id_1", "doc_id_2", "agg_sim"],
    )
    out = refine.refine_clusters(labels, sims, threshold=0.8, source_col="source")
    got = {r["doc_id"]: r["refined_id"] for r in out.collect()}
    # a and b share a source → may not merge, even at sim 0.99
    assert got["a"] != got["b"]


def test_novelty_counts(spark):
    kinds = spark.createDataFrame(
        [(1, "new_entity"), (2, "new_entity"), (3, "new_value"), (4, "new_value")],
        ["item_id", "kind"],
    )
    gold = spark.createDataFrame([(1,), (3,)], ["item_id"])
    pred = spark.createDataFrame([(1,), (2,), (4,)], ["item_id"])
    got = {r["kind"]: (r["tp"], r["fp"], r["fn"])
           for r in novelty_counts(kinds, gold, pred).collect()}
    assert got["new_entity"] == (1, 1, 0)
    assert got["new_value"] == (0, 1, 1)


def test_refine_guard_none_equals_unbounded_guard(spark):
    """max_group_size=None (caller guarantees bounded clusters) must produce
    exactly the guarded result when no cluster exceeds the guard."""
    from takco_spark.operators.refine import refine_clusters

    labels = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c2")],
        "doc_id string, cluster_id string")
    sims = spark.createDataFrame(
        [("a", "b", 0.95), ("b", "c", 0.4), ("d", "e", 0.9)],
        "doc_id_1 string, doc_id_2 string, agg_sim double")
    guarded = refine_clusters(labels, sims, threshold=0.8,
                              max_group_size=10**6)
    unguarded = refine_clusters(labels, sims, threshold=0.8,
                                max_group_size=None)
    assert (sorted(map(tuple, guarded.collect()))
            == sorted(map(tuple, unguarded.collect())))
