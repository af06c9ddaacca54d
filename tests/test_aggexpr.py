import pytest

from takco_spark.functions.aggexpr import AggExprError, compile_agg_expr


def _eval(spark, expr, row):
    df = spark.createDataFrame([row])
    col = compile_agg_expr(expr, set(row.keys()))
    return df.select(col.alias("v")).collect()[0]["v"]


def test_reference_shape_expr(spark):
    # the reference wikitables agg string shape (cluster.py:214-243)
    row = {"headjacc": 0.8, "headvec": 0.9, "bodylsh": 0.5, "bodyvec": 0.7,
           "bodytype": 0.2}
    v = _eval(
        spark,
        "@mean(@max(headjacc,@pow(headvec,4)), @max(bodylsh,@pow(bodyvec,4),bodytype))",
        row,
    )
    expected = (max(0.8, 0.9**4) + max(0.5, 0.7**4, 0.2)) / 2
    assert v == pytest.approx(expected)


def test_basic_funcs(spark):
    row = {"a": 0.2, "b": 0.6}
    assert _eval(spark, "@max(a, b)", row) == pytest.approx(0.6)
    assert _eval(spark, "@min(a, b)", row) == pytest.approx(0.2)
    assert _eval(spark, "@mean(a, b)", row) == pytest.approx(0.4)
    assert _eval(spark, "@sum(a, b, 1)", row) == pytest.approx(1.8)
    assert _eval(spark, "@prod(a, b)", row) == pytest.approx(0.12)
    assert _eval(spark, "@pow(b, 2)", row) == pytest.approx(0.36)
    assert _eval(spark, "a", row) == pytest.approx(0.2)


def test_errors():
    with pytest.raises(AggExprError):
        compile_agg_expr("@mean(a", {"a"})
    with pytest.raises(AggExprError):
        compile_agg_expr("@nope(a)", {"a"})
    with pytest.raises(AggExprError):
        compile_agg_expr("@mean(a, zz)", {"a"})
    with pytest.raises(AggExprError):
        compile_agg_expr("@pow(a)", {"a"})


def test_upper_bound_dominates(spark):
    """compile_agg_upper with `expensive` := 1.0 must dominate the actual agg
    for every score combination on the [0,1] score domain (the soundness
    contract the score_pairs cheap-first gate relies on)."""
    import itertools

    from takco_spark.functions.aggexpr import compile_agg_upper

    exprs = [
        "@mean(jaccard, @max(jw, lev_sim))",
        "@max(jaccard, jw, lev_sim)",
        "@prod(jaccard, jw)",
        "@mean(@pow(jaccard, 2), @pow(jw, 4), lev_sim)",
        "@sum(@min(jaccard, jw), @prod(lev_sim, 0.5))",
    ]
    grid = [0.0, 0.15, 0.5, 0.85, 1.0]
    rows = [
        {"jaccard": a, "jw": b, "lev_sim": c}
        for a, b, c in itertools.product(grid, grid, grid)
    ]
    df = spark.createDataFrame(rows)
    avail = {"jaccard", "jw", "lev_sim"}
    for expr in exprs:
        agg = compile_agg_expr(expr, avail)
        upper = compile_agg_upper(expr, avail, {"jw", "lev_sim"})
        assert upper is not None
        bad = df.select(agg.alias("agg"), upper.alias("upper")).where(
            "agg > upper + 1e-12").count()
        assert bad == 0, expr


def test_upper_bound_pow_exponent_unsafe():
    from takco_spark.functions.aggexpr import compile_agg_upper

    avail = {"jaccard", "jw"}
    # jw in a pow EXPONENT: x^y is decreasing in y for x<1 -> no sound bound
    assert compile_agg_upper("@pow(jaccard, jw)", avail, {"jw"}) is None
    # jw only in the BASE: still safe
    assert compile_agg_upper("@pow(jw, 2)", avail, {"jw"}) is not None
    # nested: expensive col inside a mean inside the exponent
    assert compile_agg_upper(
        "@pow(jaccard, @mean(jw, 1))", avail, {"jw"}) is None


def test_score_pairs_gate_is_transparent(spark):
    """score_pairs with the cheap-first gate must return byte-identical rows
    to an ungated run (monkeypatched bound) on a real scored corpus."""
    from unittest import mock

    from pyspark.sql import functions as F

    from takco_spark.config import PipelineConfig
    from takco_spark.operators import scoring
    from takco_spark.operators.blocking import block_documents, candidate_pairs
    from takco_spark.spans import doc_text_features, with_spans

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = with_spans(flat).select("doc_id", "spans")
    cfg = PipelineConfig()
    feats = doc_text_features(docs).persist()
    blocks, _ = block_documents(feats, cfg)
    pairs = candidate_pairs(blocks).persist()
    gated = scoring.score_pairs(pairs, feats, cfg)
    with mock.patch(
        "takco_spark.functions.aggexpr.compile_agg_upper",
        return_value=None,
    ):
        ungated = scoring.score_pairs(pairs, feats, cfg)
    assert gated.count() > 0
    assert gated.exceptAll(ungated).count() == 0
    assert ungated.exceptAll(gated).count() == 0
