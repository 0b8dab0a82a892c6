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
- ``cardinality`` — leaf ``"ONE"`` unwraps a list field to its first
  element, ``"MANY"`` wraps a single value into a one-element list
  (reference nifi-jolt-bundle JoltTransformJSON TRANSFORM value
  ``jolt-transform-card``).
- ``sort`` — recursively orders struct fields by name (Jolt's sortr;
  ``jolt-transform-sort``). Takes no spec.
- ``modify-default-beta`` / ``modify-overwrite-beta`` /
  ``modify-define-beta`` — leaf values are
  literals or ``=fn`` templates; supported fns: ``toUpper`` ``toLower``
  ``trim`` ``size`` ``abs`` ``toInteger`` ``toDouble`` ``toString`` and
  ``concat(...)`` / ``join(sep, ...)`` with ``@(1,field)`` sibling refs
  and quoted literals. *default* writes only when the target is NULL or
  missing; *overwrite* always writes; *define* writes only when the key
  is ABSENT (with schema'd records: not a struct field) — a
  present-but-null value stays null, the Definr/Defaultr distinction.

Unsupported Jolt features (``@`` value refs in shift, multi-level
``&N``, custom Java transform classes) raise ValueError — their flows
need the imperative escape
hatch (`functions/recordpath.py` + expressions). JSLT programs are a
separate language with their own compiler: see ``operators/jslt.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _field_types(dt: T.DataType) -> dict[str, T.DataType]:
    if not isinstance(dt, T.StructType):
        raise ValueError(f"spec navigates into non-struct type {dt.simpleString()}")
    return {f.name: f.dataType for f in dt.fields}


_INDEXED_AMP = re.compile(r"&[\d(]")


def _check_out_path(v: str) -> str:
    # '&0' / '&(1,0)' are multi-level match refs; plain '&' substitution
    # would silently mangle them into '<field>0' — reject up front.
    if _INDEXED_AMP.search(v):
        raise ValueError(
            f"unsupported indexed Jolt match ref in output path {v!r} "
            "(only plain '&' is supported)"
        )
    return v


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
            _check_out_path(v)
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
                _check_out_path(v)
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
                    # copy the fields list: StructType keeps the passed list
                    # by reference and .add appends in place, which would
                    # silently grow the source DataFrame's cached schema
                    dt = T.StructType(list(dt.fields)).add(k, _lit_type(v))
        elif op == "remove":
            col = jolt_remove(col, dt, spec)
            dt = _remove_out_type(dt, spec)
        elif op == "cardinality":
            col = jolt_cardinality(col, dt, spec)
            dt = _cardinality_out_type(dt, spec)
        elif op == "sort":
            col = jolt_sort(col, dt)
            dt = _sort_out_type(dt)
        elif op in (
            "modify-default-beta", "modify-overwrite-beta", "modify-define-beta"
        ):
            mode = op.split("-")[1]  # default / overwrite / define
            col = jolt_modify(col, dt, spec, mode=mode)
            dt = _modify_out_type(dt, spec, mode=mode)
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


def jolt_cardinality(col: Column, dt: T.DataType, spec: dict) -> Column:
    """ONE: list → first element; MANY: single value → one-element list
    (reference nifi-jolt-bundle JoltTransformJSON ``jolt-transform-card``)."""
    fields = _field_types(dt)
    for k, v in spec.items():
        if k not in fields:
            raise ValueError(f"cardinality key {k!r} not in input struct")
        if isinstance(v, dict):
            col = col.withField(k, jolt_cardinality(col[k], fields[k], v))
        elif v == "ONE":
            if isinstance(fields[k], T.ArrayType):
                col = col.withField(k, F.element_at(col[k], 1))
        elif v == "MANY":
            if not isinstance(fields[k], T.ArrayType):
                col = col.withField(k, F.array(col[k]))
        else:
            raise ValueError(f"cardinality value must be ONE/MANY, got {v!r}")
    return col


def _cardinality_out_type(dt: T.DataType, spec: dict) -> T.StructType:
    out = T.StructType()
    for f in dt.fields:
        v = spec.get(f.name)
        if v is None:
            out.add(f)
        elif isinstance(v, dict):
            out.add(f.name, _cardinality_out_type(f.dataType, v))
        elif v == "ONE":
            out.add(
                f.name,
                f.dataType.elementType
                if isinstance(f.dataType, T.ArrayType)
                else f.dataType,
            )
        else:  # MANY
            out.add(
                f.name,
                f.dataType
                if isinstance(f.dataType, T.ArrayType)
                else T.ArrayType(f.dataType),
            )
    return out


def jolt_sort(col: Column, dt: T.DataType) -> Column:
    """Recursively order struct fields by name (Jolt sortr)."""
    if not isinstance(dt, T.StructType):
        return col
    parts = []
    for f in sorted(dt.fields, key=lambda f: f.name):
        c = col[f.name]
        if isinstance(f.dataType, T.StructType):
            c = jolt_sort(c, f.dataType)
        parts.append(c.alias(f.name))
    return F.struct(*parts)


def _sort_out_type(dt: T.DataType) -> T.StructType:
    out = T.StructType()
    for f in sorted(dt.fields, key=lambda f: f.name):
        out.add(
            f.name,
            _sort_out_type(f.dataType)
            if isinstance(f.dataType, T.StructType)
            else f.dataType,
        )
    return out


# --- modify-default-beta / modify-overwrite-beta -------------------------

_MODIFY_STR_FNS = {"toUpper": F.upper, "toLower": F.lower, "trim": F.trim}


def _split_args(s: str) -> list[str]:
    args, depth, cur = [], 0, ""
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        args.append(cur.strip())
    return args


_SIBLING_REF = re.compile(r"^@\(1,([A-Za-z_][A-Za-z0-9_]*)\)$")


def _arg_col(a: str, col: Column, fields: dict) -> Column:
    m = _SIBLING_REF.match(a)
    if m:
        name = m.group(1)
        if name not in fields:
            raise ValueError(f"modify ref @(1,{name}) not in input struct")
        return col[name]
    if len(a) >= 2 and a[0] == a[-1] and a[0] in "'\"":
        return F.lit(a[1:-1])
    try:
        return F.lit(int(a))
    except ValueError:
        pass
    try:
        return F.lit(float(a))
    except ValueError:
        raise ValueError(f"unsupported modify argument {a!r}")


def _modify_expr(k: str, v: str, col: Column, dt_k: T.DataType | None,
                 fields: dict) -> tuple[Column, T.DataType]:
    """Compile one '=fn' template leaf → (expression, result type)."""
    body = v[1:]
    if "(" in body:
        fn, argstr = body.split("(", 1)
        if not argstr.endswith(")"):
            raise ValueError(f"malformed modify template {v!r}")
        args = _split_args(argstr[:-1])
    else:
        fn, args = body, None

    def self_col() -> Column:
        if dt_k is None:
            raise ValueError(
                f"modify fn ={fn} on missing field {k!r} needs an argument"
            )
        return col[k]

    if fn in _MODIFY_STR_FNS:
        target = _arg_col(args[0], col, fields) if args else self_col()
        return _MODIFY_STR_FNS[fn](target), T.StringType()
    if fn == "size":
        target_dt = dt_k
        target = self_col() if args is None else _arg_col(args[0], col, fields)
        if args:
            m = _SIBLING_REF.match(args[0])
            target_dt = fields.get(m.group(1)) if m else T.StringType()
        if isinstance(target_dt, (T.ArrayType, T.MapType)):
            return F.size(target), T.IntegerType()
        return F.length(target.cast("string")), T.IntegerType()
    if fn == "abs":
        target = _arg_col(args[0], col, fields) if args else self_col()
        return F.abs(target), (dt_k or T.DoubleType())
    if fn == "toInteger":
        target = _arg_col(args[0], col, fields) if args else self_col()
        return target.cast("long"), T.LongType()
    if fn == "toDouble":
        target = _arg_col(args[0], col, fields) if args else self_col()
        return target.cast("double"), T.DoubleType()
    if fn == "toString":
        target = _arg_col(args[0], col, fields) if args else self_col()
        return target.cast("string"), T.StringType()
    if fn == "concat":
        if not args:
            raise ValueError("=concat needs arguments")
        cols = [_arg_col(a, col, fields).cast("string") for a in args]
        return F.concat(*cols), T.StringType()
    if fn == "join":
        if not args or len(args) < 2:
            raise ValueError("=join needs (separator, args...)")
        sep = args[0]
        if not (len(sep) >= 2 and sep[0] == sep[-1] and sep[0] in "'\""):
            raise ValueError("=join separator must be a quoted literal")
        cols = [_arg_col(a, col, fields).cast("string") for a in args[1:]]
        return F.concat_ws(sep[1:-1], *cols), T.StringType()
    raise ValueError(
        f"unsupported modify fn {fn!r} (supported: toUpper toLower trim "
        "size abs toInteger toDouble toString concat join)"
    )


def jolt_modify(col: Column, dt: T.DataType, spec: dict, *, mode: str) -> Column:
    """modify-{default,overwrite,define}-beta as Catalyst withField chains
    (reference nifi-jolt-bundle ``jolt-transform-modify-default`` /
    ``-overwrite`` / ``-define``). Mode semantics over schema'd records
    (Jolt's Overwritr / Defaultr / Definr):

    - ``overwrite`` — always write;
    - ``default``  — write only when the existing value is null
      (``coalesce(orig, fill)``); new fields are added;
    - ``define``   — write only when the KEY is absent. With a fixed
      schema, key presence IS schema membership, so define never touches
      an existing field (a present-but-null value stays null — the
      distinction from default) and only adds new fields.
    """
    if mode not in ("default", "overwrite", "define"):
        raise ValueError(f"unknown modify mode {mode!r}")
    fields = _field_types(dt)
    for k, v in spec.items():
        if isinstance(v, dict):
            if k not in fields:
                raise ValueError(f"modify into missing struct {k!r}")
            col = col.withField(
                k, jolt_modify(col[k], fields[k], v, mode=mode)
            )
            continue
        if mode == "define" and k in fields:
            continue  # Definr: existing key (even null-valued) untouched
        if isinstance(v, str) and v.startswith("="):
            expr, _ = _modify_expr(k, v, col, fields.get(k), fields)
        else:
            expr = F.lit(v)
        if mode == "default" and k in fields:
            expr = F.coalesce(col[k], expr)
        col = col.withField(k, expr)
    return col


def _modify_out_type(dt: T.DataType, spec: dict, *, mode: str) -> T.StructType:
    out_fields: dict[str, T.DataType] = {f.name: f.dataType for f in dt.fields}
    order = list(out_fields)
    existing = set(out_fields)
    for k, v in spec.items():
        if isinstance(v, dict):
            out_fields[k] = _modify_out_type(out_fields[k], v, mode=mode)
            continue
        if mode == "define" and k in existing:
            continue  # Definr leaves existing fields (and their types) alone
        if isinstance(v, str) and v.startswith("="):
            # result dtype mirrors _modify_expr's second return value
            body = v[1:].split("(", 1)[0]
            if body in ("toUpper", "toLower", "trim", "toString", "concat", "join"):
                new_dt: T.DataType = T.StringType()
            elif body == "size":
                new_dt = T.IntegerType()
            elif body == "toInteger":
                new_dt = T.LongType()
            elif body == "toDouble":
                new_dt = T.DoubleType()
            elif body == "abs":
                new_dt = out_fields.get(k, T.DoubleType())
            else:
                raise ValueError(f"unsupported modify fn in {v!r}")
        else:
            new_dt = _lit_type(v)
        if k not in existing:
            order.append(k)
            out_fields[k] = new_dt
        elif mode == "overwrite":
            out_fields[k] = new_dt
        # modify-default keeps the existing field's dtype: the expression
        # is coalesce(orig, fill) so the original type wins when present
    out = T.StructType()
    for name in order:
        out.add(name, out_fields[name])
    return out
