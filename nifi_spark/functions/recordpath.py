"""RecordPath nested-path navigation compiled to Spark column expressions.

The reference compiles RecordPath strings into a tree of path nodes
(reference nifi-commons/nifi-record-path/src/main/java/org/apache/nifi/
record/path/paths/RecordPathCompiler.java — child, array index, wildcard,
descendant, predicate, ...) and evaluates them against each record. The
Spark-first restatement compiles the same paths into
``withField`` / ``dropFields`` / ``transform`` chains — pure Catalyst
expressions, codegen'd, no UDF — so an UpdateRecord flow with
``/a/b[*]/c`` paths ports directly:

- ``/a/b``      child field navigation (struct getField / withField)
- ``/a[3]/b``   array index (targeted element update via indexed transform)
- ``/a[*]/b``   array wildcard (transform over every element)
- ``/a/*``      field wildcard (every field of a struct, schema-resolved)

Unsupported reference node types (descendant ``//x``, filter predicates
``[. = 'y']``, ranges ``[0..2]``) raise ValueError — they appear in <5% of
flows per the SURVEY.md §2.7 usage audit and each has a hand-written
``filter``/``exists`` equivalent.

Semantics note for ``[i]``: the update function must preserve the element
type (the untouched elements keep theirs); ``[*]`` may change it (the whole
array is rebuilt).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEG = re.compile(r"^([A-Za-z_*][A-Za-z0-9_]*|\*)((?:\[[^\]]+\])*)$")

Seg = tuple[str, list]  # (field name or '*', [int | '*' array steps])


def parse_path(path: str) -> list[Seg]:
    """``/a/b[*]/c`` → [('a', []), ('b', ['*']), ('c', [])]."""
    segs: list[Seg] = []
    for raw in path.strip().strip("/").split("/"):
        m = _SEG.match(raw)
        if not m:
            raise ValueError(
                f"unsupported RecordPath segment {raw!r} (descendant/predicate "
                "nodes are out of scope — see module docstring)"
            )
        name, blob = m.group(1), m.group(2)
        steps = [
            "*" if s == "*" else int(s)
            for s in re.findall(r"\[([^\]]+)\]", blob)
        ]
        if any(not isinstance(s, int) and s != "*" for s in steps):
            raise ValueError(f"unsupported array step in {raw!r}")
        segs.append((name, steps))
    return segs


def _apply_steps(col: Column, steps: list, rest: list[Seg], fn) -> Column:
    """Descend through array steps then the remaining segments."""
    if not steps:
        return _apply_segs(col, rest, fn)
    head, tail = steps[0], steps[1:]
    if head == "*":
        return F.transform(col, lambda e: _apply_steps(e, tail, rest, fn))
    return F.transform(
        col,
        lambda e, i: F.when(
            i == F.lit(head), _apply_steps(e, tail, rest, fn)
        ).otherwise(e),
    )


def _apply_segs(col: Column, segs: list[Seg], fn) -> Column:
    if not segs:
        return fn(col)
    name, steps = segs[0]
    if name == "*":
        raise ValueError(
            "field wildcard '*' only supported as the final segment of "
            "update_at_path (schema resolution happens at the DataFrame level)"
        )
    return col.withField(name, _apply_steps(col[name], steps, segs[1:], fn))


def _resolve_struct_fields(df: DataFrame, segs: list[Seg]) -> list[str]:
    """Field names of the struct at the path prefix (for '*' expansion);
    array steps peel ElementTypes."""
    dt = df.schema
    for name, steps in segs:
        dt = dict((f.name, f.dataType) for f in dt.fields)[name]
        for _ in steps:
            dt = dt.elementType
    return [f.name for f in dt.fields]


def update_at_path(df: DataFrame, path: str, fn: Callable[[Column], Column]) -> DataFrame:
    """Apply ``fn`` to the value(s) at ``path`` (≙ UpdateRecord with a
    RecordPath target), leaving everything else intact."""
    segs = parse_path(path)
    if segs[-1][0] == "*" and not segs[-1][1]:
        # field wildcard: expand to one update per resolved field
        prefix = segs[:-1]
        for fname in _resolve_struct_fields(df, prefix):
            df = update_at_path(
                df, "/" + "/".join(_unparse(prefix + [(fname, [])])), fn
            )
        return df
    name, steps = segs[0]
    return df.withColumn(name, _apply_steps(F.col(name), steps, segs[1:], fn))


def get_at_path(df: DataFrame, path: str, out_col: str) -> DataFrame:
    """Project the value(s) at ``path`` into ``out_col`` (wildcard steps
    yield arrays, one level per ``[*]`` — not flattened)."""
    segs = parse_path(path)
    name, steps = segs[0]
    col = _get_steps(F.col(name), steps, segs[1:])
    return df.withColumn(out_col, col)


def _get_steps(col: Column, steps: list, rest: list[Seg]) -> Column:
    if not steps:
        if not rest:
            return col
        name, s2 = rest[0]
        return _get_steps(col[name], s2, rest[1:])
    head, tail = steps[0], steps[1:]
    if head == "*":
        return F.transform(col, lambda e: _get_steps(e, tail, rest))
    return _get_steps(F.element_at(col, head + 1), tail, rest)


def delete_at_path(df: DataFrame, path: str) -> DataFrame:
    """Remove the struct field at ``path`` (≙ RemoveRecordField with a
    nested target). The leaf must be a struct field (not an array slot)."""
    segs = parse_path(path)
    leaf, steps = segs[-1]
    if steps or leaf == "*":
        raise ValueError("delete_at_path targets a named struct field")
    parents = segs[:-1]
    if not parents:
        return df.drop(leaf)
    name, psteps = parents[0]
    dropper = lambda c: c.dropFields(leaf)  # noqa: E731
    return df.withColumn(
        name, _apply_steps(F.col(name), psteps, parents[1:], dropper)
    )


def _unparse(segs: list[Seg]) -> list[str]:
    return [
        name + "".join(f"[{s}]" for s in steps) for name, steps in segs
    ]
