"""Declarative Jolt-style spec interpreter — JoltTransformJSON, Spark-first.

The reference executes Jolt specs (shift / default / remove chains) over
each FlowFile's JSON tree (reference
nifi-standard-processors/.../standard/JoltTransformJSON.java delegating to
the public Jolt spec language). A set-oriented engine evaluates the SAME
declarative spec as one Catalyst projection over a struct column — the
spec compiles to getField/withField/dropFields/struct expressions, fully
whole-stage-codegen'd, no per-row JSON tree walking and no Python.

Supported spec subset (the operations NiFi flows use most):

- ``shift``  — nested dict; literal keys navigate the input struct, leaf
  values are dotted OUTPUT paths (string, or list of strings to fan one
  input into several outputs). ``"*"`` as a leaf key matches every field
  not claimed by a literal sibling; ``&`` in its output path substitutes
  the matched field name.
- ``default`` — nested dict of fill values: applied when the input value
  is NULL, or adds the field if the struct lacks it.
- ``remove`` — nested dict; a leaf (any non-dict value) removes that
  field.

Unsupported Jolt features (``@`` value refs, multi-level ``&N``,
``cardinality``/``sort`` ops) raise ValueError — their flows need the
imperative escape hatch (`functions/recordpath.py` + expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _field_types(dt: T.DataType) -> dict[str, T.DataType]:
    if not isinstance(dt, T.StructType):
        raise ValueError(f"spec navigates into non-struct type {dt.simpleString()}")
    return {f.name: f.dataType for f in dt.fields}


def _collect_shift(
    col: Column, dt: T.DataType, spec: dict, out: list[tuple[list[str], Column]]
) -> None:
    fields = _field_types(dt)
    literal = {k for k in spec if k not in ("*",)}
    for k, v in spec.items():
        if k == "*":
            targets = [f for f in fields if f not in literal]
            if not isinstance(v, str):
                raise ValueError('"*" supports a string output path (with &) only')
            for f in targets:
                out.append((v.replace("&", f).split("."), col[f]))
            continue
        if "&" in k or "@" in k:
            raise ValueError(f"unsupported Jolt key {k!r} (see module docstring)")
        if k not in fields:
            raise ValueError(f"shift key {k!r} not in input struct {sorted(fields)}")
        if isinstance(v, dict):
            _collect_shift(col[k], fields[k], v, out)
        elif isinstance(v, str):
            out.append((v.split("."), col[k]))
        elif isinstance(v, list):
            for p in v:
                out.append((p.split("."), col[k]))
        else:
            raise ValueError(f"unsupported shift RHS {v!r}")


def _build_struct(pairs: list[tuple[list[str], Column]]) -> Column:
    order: list[str] = []
    groups: dict[str, list[tuple[list[str], Column]]] = {}
    for path, c in pairs:
        head = path[0]
        if head not in groups:
            order.append(head)
            groups[head] = []
        groups[head].append((path[1:], c))
    parts = []
    for head in order:
        entries = groups[head]
        scalars = [c for rest, c in entries if not rest]
        nested = [(rest, c) for rest, c in entries if rest]
        if scalars and nested or len(scalars) > 1:
            raise ValueError(f"shift output path collision at {head!r}")
        parts.append(
            (scalars[0] if scalars else _build_struct(nested)).alias(head)
        )
    return F.struct(*parts)


def jolt_shift(col: Column, dt: T.DataType, spec: dict) -> Column:
    """Compile a shift spec into one output-struct expression."""
    pairs: list[tuple[list[str], Column]] = []
    _collect_shift(col, dt, spec, pairs)
    return _build_struct(pairs)


def jolt_default(col: Column, dt: T.DataType, spec: dict) -> Column:
    """Fill NULLs / add missing fields per the default spec."""
    fields = _field_types(dt)
    for k, v in spec.items():
        if isinstance(v, dict):
            if k not in fields:
                raise ValueError(f"default into missing struct {k!r}")
            col = col.withField(k, jolt_default(col[k], fields[k], v))
        elif k in fields:
            col = col.withField(k, F.coalesce(col[k], F.lit(v)))
        else:
            col = col.withField(k, F.lit(v))
    return col


def jolt_remove(col: Column, dt: T.DataType, spec: dict) -> Column:
    """Drop the fields named by the remove spec's leaves."""
    fields = _field_types(dt)
    for k, v in spec.items():
        if isinstance(v, dict):
            if k not in fields:
                raise ValueError(f"remove into missing struct {k!r}")
            col = col.withField(k, jolt_remove(col[k], fields[k], v))
        else:
            col = col.dropFields(k)
    return col


# keeps shift's output schema available to the next op in the chain
def _shift_out_type(dt: T.DataType, spec: dict) -> T.StructType:
    pairs: list[tuple[list[str], T.DataType]] = []

    def collect(d: T.DataType, s: dict) -> None:
        fields = _field_types(d)
        literal = {k for k in s if k != "*"}
        for k, v in s.items():
            if k == "*":
                for f in fields:
                    if f not in literal:
                        pairs.append((v.replace("&", f).split("."), fields[f]))
            elif isinstance(v, dict):
                collect(fields[k], v)
            elif isinstance(v, list):
                for p in v:
                    pairs.append((p.split("."), fields[k]))
            else:
                pairs.append((v.split("."), fields[k]))

    collect(dt, spec)

    def build(ps: list[tuple[list[str], T.DataType]]) -> T.StructType:
        order: list[str] = []
        groups: dict[str, list] = {}
        for path, d in ps:
            if path[0] not in groups:
                order.append(path[0])
                groups[path[0]] = []
            groups[path[0]].append((path[1:], d))
        out = T.StructType()
        for head in order:
            entries = groups[head]
            scalars = [d for rest, d in entries if not rest]
            nested = [(rest, d) for rest, d in entries if rest]
            out.add(head, scalars[0] if scalars else build(nested))
        return out

    return build(pairs)


def jolt_chain(
    df: DataFrame, col_name: str, ops: list[tuple[str, dict]], out_col: str | None = None
) -> DataFrame:
    """Apply a Jolt operation chain to a struct column (≙ the processor's
    spec array). One projection; each op feeds the next."""
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[col_name]
    col = F.col(col_name)
    for op, spec in ops:
        if op == "shift":
            col, dt = jolt_shift(col, dt, spec), _shift_out_type(dt, spec)
        elif op == "default":
            col = jolt_default(col, dt, spec)
            for k, v in spec.items():
                if not isinstance(v, dict) and k not in _field_types(dt):
                    dt = T.StructType(dt.fields).add(k, _lit_type(v))
        elif op == "remove":
            col = jolt_remove(col, dt, spec)
            dt = _remove_out_type(dt, spec)
        else:
            raise ValueError(f"unsupported Jolt operation {op!r}")
    return df.withColumn(out_col or col_name, col)


def _lit_type(v) -> T.DataType:
    return {
        bool: T.BooleanType(), int: T.LongType(),
        float: T.DoubleType(), str: T.StringType(),
    }[type(v)]


def _remove_out_type(dt: T.DataType, spec: dict) -> T.StructType:
    out = T.StructType()
    fields = _field_types(dt)
    for f in dt.fields:
        v = spec.get(f.name, None)
        if v is None:
            out.add(f)
        elif isinstance(v, dict):
            out.add(f.name, _remove_out_type(fields[f.name], v))
        # else removed
    return out
