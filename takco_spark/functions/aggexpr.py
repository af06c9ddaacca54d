"""Score-aggregation expression compiler.

The reference aggregates per-matcher similarity columns with a tiny
numexpr-based DSL — e.g. ``@mean(@max(headjacc, @pow(headvec, 4)),
@max(bodylsh, @pow(bodyvec, 4), bodytype))`` — see ``aggregate_match_sims``,
/root/reference/takco/cluster/cluster.py:214-243 and the wikitables config
/root/reference/resources/pipelines/wikitables.toml:162.

We compile the same surface syntax directly to a Catalyst ``Column``
expression tree, so aggregation stays inside whole-stage codegen (no numexpr,
no Python evaluation).

Grammar:
    expr   := func | name | number
    func   := '@' ident '(' expr (',' expr)* ')'
    ident  ∈ {max, min, mean, sum, prod, pow}
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"\s*(@[A-Za-z_]\w*|[A-Za-z_]\w*|\d+\.\d+|\d+|[(),])")


class AggExprError(ValueError):
    pass


def _tokenize(expr: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            if expr[pos:].strip() == "":
                break
            raise AggExprError(f"bad token at {pos!r} in {expr!r}")
        tokens.append(m.group(1))
        pos = m.end()
    return tokens


def _reduce(fn, cols: list[Column]) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = fn(acc, c)
    return acc


def compile_agg_expr(expr: str, available: set[str] | None = None,
                     _ones: set[str] | None = None) -> Column:
    """Compile an agg string into a Column over score columns by name.

    ``_ones`` (internal, see :func:`compile_agg_upper`): names replaced by
    the literal 1.0 instead of a column reference."""
    tokens = _tokenize(expr)
    pos = 0

    def parse(in_pow_exp: bool = False) -> Column:
        nonlocal pos
        if pos >= len(tokens):
            raise AggExprError(f"unexpected end of {expr!r}")
        tok = tokens[pos]
        pos += 1
        if tok.startswith("@"):
            name = tok[1:].lower()
            if pos >= len(tokens) or tokens[pos] != "(":
                raise AggExprError(f"expected '(' after {tok} in {expr!r}")
            pos += 1
            is_pow = name == "pow"
            args = [parse(in_pow_exp)]
            while pos < len(tokens) and tokens[pos] == ",":
                pos += 1
                # a @pow exponent: substitution there would not be an upper
                # bound (x^y is DECREASING in y for x < 1)
                args.append(parse(in_pow_exp or (is_pow and len(args) == 1)))
            if pos >= len(tokens) or tokens[pos] != ")":
                raise AggExprError(f"expected ')' in {expr!r}")
            pos += 1
            if name == "max":
                return F.greatest(*args) if len(args) > 1 else args[0]
            if name == "min":
                return F.least(*args) if len(args) > 1 else args[0]
            if name == "mean":
                return _reduce(lambda a, b: a + b, args) / F.lit(float(len(args)))
            if name == "sum":
                return _reduce(lambda a, b: a + b, args)
            if name == "prod":
                return _reduce(lambda a, b: a * b, args)
            if name == "pow":
                if len(args) != 2:
                    raise AggExprError("@pow takes exactly 2 args")
                return F.pow(args[0], args[1])
            raise AggExprError(f"unknown function @{name}")
        if re.fullmatch(r"\d+(\.\d+)?", tok):
            return F.lit(float(tok))
        if re.fullmatch(r"[A-Za-z_]\w*", tok):
            if available is not None and tok not in available:
                raise AggExprError(f"unknown score column {tok!r}; have {sorted(available)}")
            if _ones is not None and tok in _ones:
                if in_pow_exp:
                    raise _UpperUnsafe(tok)
                return F.lit(1.0)
            return F.col(tok)
        raise AggExprError(f"unexpected token {tok!r} in {expr!r}")

    col = parse()
    if pos != len(tokens):
        raise AggExprError(f"trailing tokens {tokens[pos:]} in {expr!r}")
    return col


class _UpperUnsafe(Exception):
    """A substituted column sits in a @pow exponent — no sound upper bound."""


def compile_agg_upper(expr: str, available: set[str],
                      expensive: set[str]) -> Column | None:
    """UPPER BOUND of the agg expression with every column in ``expensive``
    replaced by the literal 1.0 — or None when no sound bound exists.

    Sound because every DSL operator (max/min/mean/sum/prod, and @pow in its
    BASE argument) is monotone nondecreasing in each score input on the score
    domain [0, 1] (all matcher columns are clipped/normalized nonnegative and
    ≤ 1), and IEEE add/mul/greatest/least/pow preserve that monotonicity —
    so for any row, agg(actual scores) ≤ agg(scores with expensive := 1.0).
    A row failing ``upper >= threshold`` therefore can NEVER pass the final
    ``agg_sim >= threshold`` filter, and can be dropped before the expensive
    columns are computed (guide §2.3: don't compute what you throw away).
    The one non-monotone position is a @pow EXPONENT (x^y decreases in y for
    x < 1): if an expensive column appears there, return None and skip the
    prefilter."""
    try:
        return compile_agg_expr(expr, available, _ones=expensive)
    except _UpperUnsafe:
        return None
