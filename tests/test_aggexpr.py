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
