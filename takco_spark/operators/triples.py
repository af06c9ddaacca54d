"""Triple flatten/emission — linked-labelled tables → long-format RDF-ish
triples (A12's input producer).

Reference: ``yield_triples`` (/root/reference/takco/evaluate/triples.py:14-133)
walks each table's nested annotation dicts and yields one record per
(kind, s, p, o) with gold/pred membership flags; those records feed the
novelty counting set algebra (novelty.py:61-96 → plans.metrics.novelty_counts
here). The reference's per-table Python loops become four joins over
long-format annotation streams — each table's nested ``entities`` /
``classes`` / ``properties`` / ``gold.*`` dicts are rows keyed by
(table_id, col[, row]) with a ``source`` column ('pred' | 'gold').

Semantics preserved:

- *label* triples: every entity annotation on a cell emits
  (e, rdfs:label, cell_text); gold = e ∈ gold entities of that cell,
  pred = e ∈ pred entities (triples.py:25-45).
- *class* triples: the column's classes × the column's entity annotations;
  kept when (e∈gold ∧ cls∈gold) ∨ (e∈pred ∧ cls∈pred) (triples.py:48-70).
  The reference iterates PRED-dict keys at the outer levels
  (``table["classes"].items()`` then ``table["entities"][ci].items()``,
  triples.py:48,51): a column with no PREDICTED class emits nothing even if
  gold classes exist, and a cell with no PREDICTED entity emits nothing even
  if gold entities exist — mirrored here as semi-joins on the pred streams.
- *property* triples: (from_col→to_col) properties × per-row from-entities,
  kept when (s∈gold ∧ p∈gold) ∨ (s∈pred ∧ p∈pred); the object is the to-cell's
  PREDICTED entity when the to-column has any entity annotations
  (``isentityprop``, triples.py:77-78,101-108), else the to-cell text as a
  literal — one triple per predicted to-column class as its datatype when
  classes exist, else a plain literal (triples.py:109-133). Same pred-key
  outer iteration (triples.py:73,81): the (from_col,to_col) key must be in
  the PRED properties dict and the from-cell must have PREDICTED entities.
- ``hasgold``: a table with no gold annotations at all yields gold=NULL
  flags, not False (triples.py:17-18) — "unannotated", not "wrong".

Deviation (documented): the reference iterates pred-then-gold dicts and can
emit the same triple twice when an entity is in both; this operator is
set-semantic (one row per distinct triple, both flags populated). The
novelty arithmetic downstream is hash-SET algebra, so counts are identical.

Scale shape: every join keys on (table_id[, col, row]) — co-partitioned
annotation streams, no driver collection; the class/property cross products
are bounded by annotations-per-column, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rdflib constants the reference emits (triples.py:4-5).
TYPE_P = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
LABEL_P = "http://www.w3.org/2000/01/rdf-schema#label"


def _pivot_sources(df: DataFrame, keys: list[str], score_col: str = "score"
                   ) -> DataFrame:
    """(keys..., source, score) → one row per key tuple with is_pred/is_gold
    flags and per-source scores (pred preferred downstream)."""
    return df.groupBy(*keys).agg(
        F.max(F.col("source") == "pred").alias("is_pred"),
        F.max(F.col("source") == "gold").alias("is_gold"),
        F.max(F.when(F.col("source") == "pred", F.col(score_col))).alias("pred_score"),
        F.max(F.when(F.col("source") == "gold", F.col(score_col))).alias("gold_score"),
    )


def flatten_triples(
    cells: DataFrame,
    entities: DataFrame,
    classes: DataFrame | None = None,
    properties: DataFrame | None = None,
    include_label: bool = True,
    include_type: bool = True,
) -> DataFrame:
    """Long-format annotation streams → triples.

    Inputs:
      cells(table_id, row, col, text)
      entities(table_id, col, row, entity, score, source∈{'pred','gold'})
      classes(table_id, col, cls, score, source)          [optional]
      properties(table_id, from_col, to_col, prop, score, source) [optional]

    Output: (kind, s, p, o, o_datatype, col, row, gold, pred, s_score) —
    one row per distinct triple occurrence; ``gold`` is NULL for tables
    without any gold annotation (hasgold=False), boolean otherwise.
    """
    ent = _pivot_sources(entities, ["table_id", "col", "row", "entity"])
    # the reference iterates PRED-dict keys at the outer levels
    # (triples.py:48,51,73,81): cells/columns/property-keys with only GOLD
    # annotations emit no class/property triples
    pred_cells = (
        entities.where(F.col("source") == "pred")
        .select("table_id", "col", "row").distinct()
    )

    # hasgold per table: any gold row in any annotation stream
    gold_tables = entities.where(F.col("source") == "gold").select("table_id")
    if classes is not None:
        gold_tables = gold_tables.unionByName(
            classes.where(F.col("source") == "gold").select("table_id"))
    if properties is not None:
        gold_tables = gold_tables.unionByName(
            properties.where(F.col("source") == "gold").select("table_id"))
    hasgold = gold_tables.distinct().withColumn("_hasgold", F.lit(True))

    parts: list[DataFrame] = []

    if include_label:
        lab = (
            ent.join(cells, ["table_id", "row", "col"], "left")
            .select(
                "table_id",
                F.lit("label").alias("kind"),
                F.col("entity").alias("s"),
                F.lit(LABEL_P).alias("p"),
                F.coalesce(F.col("text"), F.lit("")).alias("o"),
                F.lit(None).cast("string").alias("o_datatype"),
                "col", "row",
                F.col("is_gold").alias("_gold"),
                F.col("is_pred").alias("pred"),
                F.coalesce("pred_score", "gold_score").alias("s_score"),
            )
        )
        parts.append(lab)

    if include_type and classes is not None:
        cls = _pivot_sources(classes, ["table_id", "col", "cls"])
        # outer iteration is over table["classes"] (pred) keys: a column
        # whose classes are all gold-only emits nothing (triples.py:48)
        pred_cls_cols = (
            classes.where(F.col("source") == "pred")
            .select("table_id", "col").distinct()
        )
        cls = cls.join(pred_cls_cols, ["table_id", "col"], "left_semi")
        clt = (
            # rows come from table["entities"][ci] (pred) keys: a cell with
            # only gold entities emits nothing (triples.py:51)
            ent.join(pred_cells, ["table_id", "col", "row"], "left_semi")
            .join(
                cls.select(
                    "table_id", "col", "cls",
                    F.col("is_pred").alias("c_pred"),
                    F.col("is_gold").alias("c_gold"),
                ),
                ["table_id", "col"],
            )
            .withColumn("_g", F.col("is_gold") & F.col("c_gold"))
            .withColumn("_p", F.col("is_pred") & F.col("c_pred"))
            .where(F.col("_g") | F.col("_p"))
            .select(
                "table_id",
                F.lit("class").alias("kind"),
                F.col("entity").alias("s"),
                F.lit(TYPE_P).alias("p"),
                F.col("cls").alias("o"),
                F.lit(None).cast("string").alias("o_datatype"),
                "col", "row",
                F.col("_g").alias("_gold"),
                F.col("_p").alias("pred"),
                F.coalesce("pred_score", "gold_score").alias("s_score"),
            )
        )
        parts.append(clt)

    if properties is not None:
        prp = _pivot_sources(properties, ["table_id", "from_col", "to_col", "prop"])
        # outer iteration is over table["properties"] (pred) keys
        # (triples.py:73): gold-only (from_col, to_col) keys emit nothing
        pred_prp_keys = (
            properties.where(F.col("source") == "pred")
            .select("table_id", "from_col", "to_col").distinct()
        )
        prp = prp.join(pred_prp_keys, ["table_id", "from_col", "to_col"],
                       "left_semi")
        from_ent = ent.join(
            pred_cells, ["table_id", "col", "row"], "left_semi"
        ).select(
            "table_id", F.col("col").alias("from_col"), "row",
            F.col("entity").alias("s"),
            F.col("is_pred").alias("s_pred"), F.col("is_gold").alias("s_gold"),
            "pred_score", "gold_score",
        )
        base = (
            prp.select(
                "table_id", "from_col", "to_col", "prop",
                F.col("is_pred").alias("p_pred"),
                F.col("is_gold").alias("p_gold"),
            )
            .join(from_ent, ["table_id", "from_col"])
            .withColumn("_g", F.col("s_gold") & F.col("p_gold"))
            .withColumn("_p", F.col("s_pred") & F.col("p_pred"))
            .where(F.col("_g") | F.col("_p"))
        )
        # isentityprop: reference checks the to-COLUMN for any (predicted)
        # entity annotations; if present, objects come from the to-cell's
        # predicted entities and rows without one emit nothing.
        to_ent_pred = entities.where(F.col("source") == "pred").select(
            "table_id", F.col("col").alias("to_col"), "row",
            F.col("entity").alias("o_ent"),
        ).distinct()
        ent_cols = to_ent_pred.select("table_id", "to_col").distinct()

        ent_branch = (
            base.join(ent_cols, ["table_id", "to_col"], "left_semi")
            .join(to_ent_pred, ["table_id", "to_col", "row"])
            .select(
                "table_id",
                F.lit("property").alias("kind"),
                "s",
                F.col("prop").alias("p"),
                F.col("o_ent").alias("o"),
                F.lit(None).cast("string").alias("o_datatype"),
                F.col("to_col").alias("col"), "row",
                F.col("_g").alias("_gold"),
                F.col("_p").alias("pred"),
                F.coalesce("pred_score", "gold_score").alias("s_score"),
            )
        )
        # literal branch: to-cell text; one triple per PREDICTED to-column
        # class as the literal's datatype when classes exist, else one plain
        # literal (a left join yields exactly that shape).
        to_cls_pred = (
            classes.where(F.col("source") == "pred")
            .select("table_id", F.col("col").alias("to_col"),
                    F.col("cls").alias("o_datatype"))
            .distinct()
            if classes is not None else None
        )
        lit_base = (
            base.join(ent_cols, ["table_id", "to_col"], "left_anti")
            .join(
                cells.select("table_id", "row", F.col("col").alias("to_col"),
                             "text"),
                ["table_id", "to_col", "row"],
            )
            .where(F.col("text").isNotNull() & (F.col("text") != ""))
        )
        if to_cls_pred is not None:
            lit_base = lit_base.join(to_cls_pred, ["table_id", "to_col"], "left")
        else:
            lit_base = lit_base.withColumn(
                "o_datatype", F.lit(None).cast("string"))
        lit_branch = lit_base.select(
            "table_id",
            F.lit("property").alias("kind"),
            "s",
            F.col("prop").alias("p"),
            F.col("text").alias("o"),
            "o_datatype",
            F.col("to_col").alias("col"), "row",
            F.col("_g").alias("_gold"),
            F.col("_p").alias("pred"),
            F.coalesce("pred_score", "gold_score").alias("s_score"),
        )
        parts.append(ent_branch)
        parts.append(lit_branch)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.join(hasgold, "table_id", "left")
        .select(
            "table_id", "kind", "s", "p", "o", "o_datatype", "col", "row",
            F.when(F.col("_hasgold").isNotNull(), F.col("_gold")).alias("gold"),
            "pred", "s_score",
        )
    )


def triples_to_novelty_inputs(triples: DataFrame
                              ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Triples → the (kinds, gold, pred) inputs of
    :func:`takco_spark.plans.metrics.novelty_counts` — the reference's
    per-kind triple-hash sets (novelty.py). The item identity is the
    (kind, s, p, o, o_datatype) tuple (the triple_hash analog), so the same
    (s,p,o) counted under two kinds stays distinct, as in the reference's
    per-kind hash dicts."""
    keyed = triples.select(
        F.concat_ws(
            "\u0001", "kind", "s", "p",
            F.coalesce("o", F.lit("")), F.coalesce("o_datatype", F.lit("")),
        ).alias("item_id"),
        "kind", "gold", "pred",
    )
    kinds = keyed.select("item_id", "kind").distinct()
    gold = keyed.where(F.col("gold")).select("item_id").distinct()
    pred = keyed.where(F.col("pred")).select("item_id").distinct()
    return kinds, gold, pred


def shift_annotation_cols(df: DataFrame, n: int, cols: tuple[str, ...]
                          ) -> DataFrame:
    """Shift column-index fields right by ``n`` after context columns are
    prepended (reference context.py:50-62: entities/classes/properties keys
    move from ci to ci+n). ``cols`` names the integer column-index fields —
    ('col',) for entity/class streams, ('from_col', 'to_col') for property
    streams."""
    out = df
    for c in cols:
        out = out.withColumn(c, (F.col(c) + F.lit(int(n))).cast("int"))
    return out
