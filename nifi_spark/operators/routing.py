"""Routing / predicate operators — NiFi's multi-output filters, Spark-first.

NiFi routes FlowFiles to named relationships instead of filtering:
RouteOnAttribute (reference .../standard/RouteOnAttribute.java), RouteText
(RouteText.java), RouteOnContent (RouteOnContent.java), ScanAttribute /
ScanContent (ScanAttribute.java, ScanContent.java), ValidateRecord
(ValidateRecord.java). In Spark a "relationship" is either a filtered view
of one cached plan, or — cheaper at scale — a single pass that stamps a
``route`` column and lets the writer partition by it (one scan, no N-pass
re-read; Catalyst pushes each branch filter to the scan when branches are
materialized separately).

Scale notes: `route_column` is one narrow projection — no shuffle.
`split_routes` returns lazy filtered frames off one parent; cache the
parent only when materializing several branches in the same action window.
`scan_membership` broadcasts the dictionary (`isin`) — never a shuffle
join for a small term set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def route_column(
    df: DataFrame,
    routes: dict[str, Column],
    default: str = "unmatched",
    route_col: str = "route",
) -> DataFrame:
    """One-pass routing: stamp the first matching route name per row.

    ≙ RouteOnAttribute with "Route to Property name" strategy
    (reference RouteOnAttribute.java: each dynamic property = EL predicate →
    relationship); first-match-wins like an ordered CASE.
    """
    expr = None
    for name, pred in routes.items():
        expr = F.when(pred, F.lit(name)) if expr is None else expr.when(pred, F.lit(name))
    expr = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
    return df.withColumn(route_col, expr)


def split_routes(
    df: DataFrame, routes: dict[str, Column], with_unmatched: bool = True
) -> dict[str, DataFrame]:
    """Multi-output routing: one lazy DataFrame per named relationship.

    Rows can match several routes (NiFi "Route to all matching" semantics);
    ``unmatched`` collects rows matching none.
    """
    out = {name: df.filter(pred) for name, pred in routes.items()}
    if with_unmatched:
        none_match = None
        for pred in routes.values():
            none_match = ~pred if none_match is None else none_match & ~pred
        out["unmatched"] = df.filter(none_match) if none_match is not None else df
    return out


def route_text_lines(
    df: DataFrame,
    text_col: str,
    matchers: dict[str, str],
    strategy: str = "contains",
) -> DataFrame:
    """Per-row text routing by contains/startswith/endswith/regex.

    ≙ RouteText's matching strategies (reference RouteText.java: Starts With
    / Ends With / Contains / Matches Regular Expression properties).
    """
    ops = {
        "contains": lambda c, p: c.contains(p),
        "startswith": lambda c, p: c.startswith(p),
        "endswith": lambda c, p: c.endswith(p),
        "matches": lambda c, p: c.rlike(p),
    }
    fn = ops[strategy]
    return route_column(df, {name: fn(F.col(text_col), pat) for name, pat in matchers.items()})


def scan_membership(
    df: DataFrame, col: str, terms: list[str], negate: bool = False
) -> DataFrame:
    """Dictionary-membership filter (broadcast set, no shuffle).

    ≙ ScanAttribute / ScanContent dictionary match (reference
    ScanAttribute.java: terms file → matched/unmatched routing). `isin`
    compiles to an in-predicate evaluated at the scan; for very large
    dictionaries use a broadcast join instead (see enrich.lookup).
    """
    pred = F.col(col).isin(terms)
    return df.filter(~pred if negate else pred)


def validate(
    df: DataFrame, condition: Column
) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) split by a schema/content predicate.

    ≙ ValidateRecord / ValidateCsv / ValidateJson two-relationship output
    (reference ValidateRecord.java). For from_json-style structural
    validation, pass `F.from_json(col, schema).isNotNull()`.
    """
    return df.filter(condition), df.filter(~condition)
