"""RecordPath nested-path navigation compiled to Spark column expressions.

The reference compiles RecordPath strings into a tree of path nodes
(reference nifi-commons/nifi-record-path/src/main/java/org/apache/nifi/
record/path/paths/RecordPathCompiler.java — 16 node types) and evaluates
them against each record. The Spark-first restatement compiles the same
paths into ``withField`` / ``dropFields`` / ``transform`` / ``filter`` /
``map_entries`` chains — pure Catalyst expressions, codegen'd, no UDF —
so an UpdateRecord flow with nested RecordPath targets ports directly:

- ``/a/b``          child field (ChildFieldPath — getField / withField)
- ``/a[3]/b``       array index (ArrayIndexPath — indexed transform)
- ``/a[0,2]/b``     multi index (MultiArrayIndexPath)
- ``/a[0..2]/b``    index range (inclusive, NiFi range syntax)
- ``/a[*]/b``       array wildcard (WildcardIndexPath — transform)
- ``/a/*``          field wildcard (WildcardChildPath, schema-resolved)
- ``/m['k']``       map key (SingularMapKeyPath — getItem / entry rebuild)
- ``/m['a','b']``   multi map key (MultiMapKeyPath — get only)
- ``/a[./f = 'x']`` predicate (PredicatePath — filter / conditional
                    transform; operand ``.`` or a child field, ops
                    ``= != > >= < <=``, literal string/number)
- ``//name``        descendant (DescendantFieldPath — schema-resolved to
                    every nested field of that name, walking structs,
                    arrays-of-struct via an implicit ``[*]`` step, AND
                    maps with struct values via an implicit ``['*']``
                    wildcard-map-key step, like the reference's
                    isRecord/isRecordArray/map-value recursion; scalar
                    arrays and scalar-valued maps stop the walk — address
                    those with explicit ``['k']``/``[*]`` steps)
- ``/m['*']/b``     wildcard map key (every map value — transform_values
                    on update, map_values on read)
- ``//*``           wildcard descendant (WildcardDescendantPath.java
                    findDescendants — every field at every depth,
                    parent-first, so a child update applied after its
                    parent's wins, matching NiFi's sequential FieldValue
                    updates; filter with ``where_type`` for the common
                    "all string leaves" use)
- ``/a/b/..``       parent (ParentPath — normalized at parse time by
                    popping the previous segment; ``..`` above the root
                    raises, and a popped segment's index/predicate steps
                    are popped with it)
- ``.`` / ``/.``    current field (CurrentFieldPath — identity; the
                    bare record path ``.`` selects/updates the whole
                    record as a struct)

All 16 RecordPathCompiler.java node types are covered; descendant
resolution stays schema-side and walks struct, array-of-struct, and
struct-valued-map nesting (scalar arrays/maps take explicit
``[*]``/``['k']`` steps).

Semantics note for ``[i]``/predicates: the update function must preserve
the element type (untouched elements keep theirs); ``[*]`` may change it
(the whole array is rebuilt).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEG = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*|\*)((?:\[[^\]]+\])*)$")
_PRED = re.compile(
    r"^\s*(\.|(?:\./)?[A-Za-z_][A-Za-z0-9_]*)\s*(!=|>=|<=|=|>|<)\s*(.+?)\s*$"
)
_RANGE = re.compile(r"^\s*(\d+)\s*\.\.\s*(\d+)\s*$")
_KEYS = re.compile(r"^\s*'([^']*)'(?:\s*,\s*'([^']*)')*\s*$")

Seg = tuple[str, list]  # (field name, '*' or '**', [step, ...])

# step forms: int | '*' | ('idx', [ints]) | ('key', [strs]) |
#             ('pred', operand, op, literal)


def _parse_step(s: str):
    s = s.strip()
    if s == "*":
        return "*"
    if re.fullmatch(r"\d+", s):
        return int(s)
    m = _RANGE.match(s)
    if m:
        lo, hi = int(m.group(1)), int(m.group(2))
        return ("idx", list(range(lo, hi + 1)))
    if re.fullmatch(r"\d+(\s*,\s*\d+)+", s):
        return ("idx", [int(x) for x in s.split(",")])
    if _KEYS.match(s):
        keys = re.findall(r"'([^']*)'", s)
        if keys == ["*"]:
            # wildcard map key — every value of the map (transform_values
            # on update, map_values on read)
            return ("mapstar",)
        return ("key", keys)
    m = _PRED.match(s)
    if m:
        operand, op, lit = m.group(1), m.group(2), m.group(3)
        operand = operand[2:] if operand.startswith("./") else operand
        if re.fullmatch(r"'[^']*'", lit):
            val = lit[1:-1]
        elif re.fullmatch(r"-?\d+", lit):
            val = int(lit)
        elif re.fullmatch(r"-?\d+\.\d+", lit):
            val = float(lit)
        else:
            raise ValueError(f"unsupported predicate literal {lit!r}")
        return ("pred", operand, op, val)
    raise ValueError(f"unsupported RecordPath step [{s}]")


def parse_path(path: str) -> list[Seg]:
    """``/a/b[*]/c`` → [('a', []), ('b', ['*']), ('c', [])]; a leading
    empty segment from ``//`` marks the next segment as descendant
    (name prefixed ``**``)."""
    # split on '/' only outside [...] (predicates contain relative './'
    # operands, so a naive split would break inside the brackets)
    s = path.strip().rstrip("/")
    if not s:
        return []  # '/' — the record root
    raw_segs, buf, depth = [], [], 0
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "/" and depth == 0:
            raw_segs.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    raw_segs.append("".join(buf))
    if raw_segs and raw_segs[0] == "":
        raw_segs = raw_segs[1:]
    segs: list[Seg] = []
    descend = False
    for raw in raw_segs:
        if raw == "":
            if descend:
                raise ValueError(f"'///' not a valid RecordPath in {path!r}")
            descend = True
            continue
        if raw == ".":
            # CurrentFieldPath — identity, dropped at parse time
            if descend:
                raise ValueError(f"'//.' not a valid RecordPath in {path!r}")
            continue
        if raw == "..":
            # ParentPath — pop the previous segment (steps and all)
            if descend:
                raise ValueError(f"'//..' not a valid RecordPath in {path!r}")
            if not segs:
                raise ValueError(f"ParentPath '..' above the record root in {path!r}")
            segs.pop()
            continue
        m = _SEG.match(raw)
        if not m:
            raise ValueError(f"unsupported RecordPath segment {raw!r}")
        name, blob = m.group(1), m.group(2)
        steps = [_parse_step(s) for s in re.findall(r"\[([^\]]+)\]", blob)]
        if descend:
            name = "**" + name  # '//*' becomes '***' (fields can't be '*')
            descend = False
        segs.append((name, steps))
    if descend:
        raise ValueError(f"trailing '//' in {path!r}")
    # empty = the record root ('.', '/a/..') — callers treat it as the
    # whole record (CurrentFieldPath at root)
    return segs


def _pred_col(e: Column, operand: str, op: str, val) -> Column:
    c = e if operand == "." else e[operand]
    lit = F.lit(val)
    return {
        "=": c == lit,
        "!=": c != lit,
        ">": c > lit,
        ">=": c >= lit,
        "<": c < lit,
        "<=": c <= lit,
    }[op]


def _rebuild_map(col: Column, keys: list[str], value_fn) -> Column:
    """Rebuild a map, applying ``value_fn`` to the values at ``keys``
    (entry-level conditional rewrite; no JVM map mutation exists)."""
    return F.map_from_entries(
        F.transform(
            F.map_entries(col),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.when(e["key"].isin(*keys), value_fn(e["value"]))
                .otherwise(e["value"])
                .alias("value"),
            ),
        )
    )


def _apply_steps(col: Column, steps: list, rest: list[Seg], fn) -> Column:
    """Descend through array/map/predicate steps then the remaining
    segments, applying updates in place."""
    if not steps:
        return _apply_segs(col, rest, fn)
    head, tail = steps[0], steps[1:]
    if head == "*":
        return F.transform(col, lambda e: _apply_steps(e, tail, rest, fn))
    if isinstance(head, int):
        return F.transform(
            col,
            lambda e, i: F.when(
                i == F.lit(head), _apply_steps(e, tail, rest, fn)
            ).otherwise(e),
        )
    kind = head[0]
    if kind == "idx":
        idxs = head[1]
        return F.transform(
            col,
            lambda e, i: F.when(
                i.isin(*idxs), _apply_steps(e, tail, rest, fn)
            ).otherwise(e),
        )
    if kind == "mapstar":
        return F.transform_values(
            col, lambda k, v: _apply_steps(v, tail, rest, fn)
        )
    if kind == "key":
        return _rebuild_map(
            col, head[1], lambda v: _apply_steps(v, tail, rest, fn)
        )
    # predicate: update only the matching elements
    _, operand, op, val = head
    return F.transform(
        col,
        lambda e: F.when(
            _pred_col(e, operand, op, val), _apply_steps(e, tail, rest, fn)
        ).otherwise(e),
    )


def _apply_segs(col: Column, segs: list[Seg], fn) -> Column:
    if not segs:
        return fn(col)
    name, steps = segs[0]
    if name == "*" or name.startswith("**"):
        raise ValueError(
            "field wildcard '*' / descendant '//' segments are resolved at "
            "the DataFrame level (update_at_path handles the expansion)"
        )
    return col.withField(name, _apply_steps(col[name], steps, segs[1:], fn))


def _resolve_struct_fields(df: DataFrame, segs: list[Seg]) -> list[str]:
    """Field names of the struct at the path prefix (for '*' expansion);
    array/map steps peel element/value types."""
    dt: T.DataType = df.schema
    for name, steps in segs:
        dt = dict((f.name, f.dataType) for f in dt.fields)[name]
        for s in steps:
            if isinstance(s, tuple) and s[0] in ("key", "mapstar"):
                dt = dt.valueType
            else:
                dt = dt.elementType
    return [f.name for f in dt.fields]


def _descend_type(dt: T.DataType) -> tuple[T.DataType, list] | None:
    """How descendant search enters ``dt``: structs directly; arrays of
    structs through an implicit ``[*]`` step (DescendantFieldPath.java /
    WildcardDescendantPath.java recurse into child records AND record
    arrays — Filters.isRecord / isRecordArray). Maps and scalar arrays
    stop the walk (explicit ``['k']``/``[*]`` steps address those)."""
    if isinstance(dt, T.StructType):
        return dt, []
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        return dt.elementType, ["*"]
    if isinstance(dt, T.MapType) and isinstance(dt.valueType, T.StructType):
        # the reference's DescendantFieldPath also walks map VALUES that
        # are records (Filters.isRecord on MapRecord values) — implicit
        # wildcard-map-key step; scalar-valued maps stop the walk
        return dt.valueType, [("mapstar",)]
    return None


def _descendant_paths(dt: T.DataType, name: str, prefix: list[Seg]) -> list[list[Seg]]:
    """Every nested path (struct nesting, and array-of-struct nesting via
    an implicit ``[*]`` step) ending at a field called ``name``
    (DescendantFieldPath.java getDescendants walks child records and
    record arrays). Returns full Seg lists."""
    found: list[list[Seg]] = []
    entered = _descend_type(dt)
    if entered is None:
        return found
    st, _ = entered
    for f in st.fields:
        fe = _descend_type(f.dataType)
        if f.name == name:
            found.append(prefix + [(f.name, [])])
        if fe:
            found.extend(
                _descendant_paths(f.dataType, name, prefix + [(f.name, list(fe[1]))])
            )
    return found


def _all_descendant_paths(dt: T.DataType, prefix: list[Seg]) -> list[list[Seg]]:
    """Every field path at every depth (struct + array-of-struct nesting),
    parent before child (WildcardDescendantPath.java findDescendants
    order). Returns full Seg lists."""
    found: list[list[Seg]] = []
    entered = _descend_type(dt)
    if entered is None:
        return found
    st, _ = entered
    for f in st.fields:
        found.append(prefix + [(f.name, [])])
        fe = _descend_type(f.dataType)
        if fe:
            found.extend(
                _all_descendant_paths(f.dataType, prefix + [(f.name, list(fe[1]))])
            )
    return found


def _datatype_at(schema: T.StructType, segs: list[Seg]) -> T.DataType:
    """DataType at a concrete path (steps peel element/value types)."""
    dt: T.DataType = schema
    for name, steps in segs:
        dt = dict((f.name, f.dataType) for f in dt.fields)[name]
        for s in steps:
            if isinstance(s, tuple) and s[0] in ("key", "mapstar"):
                dt = dt.valueType
            elif isinstance(s, int) or s == "*" or (
                isinstance(s, tuple) and s[0] in ("idx", "pred")
            ):
                dt = dt.elementType
    return dt


def _expand(df: DataFrame, segs: list[Seg]) -> list[list[Seg]]:
    """Expand descendant segments against the DataFrame schema into
    concrete path lists (one per match)."""
    for i, (name, steps) in enumerate(segs):
        if name.startswith("**"):
            target = name[2:]
            # datatype at the prefix (struct nesting only up to here)
            dt: T.DataType = df.schema
            for pname, psteps in segs[:i]:
                dt = dict((f.name, f.dataType) for f in dt.fields)[pname]
                if psteps:
                    raise ValueError(
                        "descendant below array/map steps is out of scope"
                    )
            matches = (
                _all_descendant_paths(dt, [])
                if target == "*"
                else _descendant_paths(dt, target, [])
            )
            out = []
            for mpath in matches:
                # mpath segments already carry implicit [*] steps for
                # array-of-struct hops; the matched leaf takes the
                # descendant segment's own explicit steps
                leaf_name, _ = mpath[-1]
                concrete = (
                    segs[:i]
                    + mpath[:-1]
                    + [(leaf_name, steps)]
                    + segs[i + 1 :]
                )
                out.extend(_expand(df, concrete))
            return out
    return [segs]


def update_at_path(
    df: DataFrame,
    path: str,
    fn: Callable[[Column], Column],
    where_type: Callable[[T.DataType], bool] | None = None,
) -> DataFrame:
    """Apply ``fn`` to the value(s) at ``path`` (≙ UpdateRecord with a
    RecordPath target), leaving everything else intact.

    ``where_type`` filters the expanded concrete paths by leaf DataType —
    the schema-side restatement of NiFi's per-FieldValue type coercion
    (e.g. ``//*`` + ``lambda t: t == T.StringType()`` updates every
    nested string leaf without touching structs or numerics)."""
    parsed = parse_path(path)
    if not parsed:
        # record root ('.', '/a/..'): fn over the whole record struct
        out = fn(F.struct(*[F.col(c) for c in df.columns]))
        return df.select(out.alias("_r")).select("_r.*")
    for segs in _expand(df, parsed):
        if segs[-1][0] == "*" and not segs[-1][1]:
            # field wildcard: expand to one update per resolved field
            prefix = segs[:-1]
            for fname in _resolve_struct_fields(df, prefix):
                df = update_at_path(
                    df,
                    "/" + "/".join(_unparse(prefix + [(fname, [])])),
                    fn,
                    where_type,
                )
            continue
        if where_type is not None and not where_type(_datatype_at(df.schema, segs)):
            continue
        name, steps = segs[0]
        df = df.withColumn(name, _apply_steps(F.col(name), steps, segs[1:], fn))
    return df


def get_at_path(df: DataFrame, path: str, out_col: str) -> DataFrame:
    """Project the value(s) at ``path`` into ``out_col`` (wildcard /
    predicate / multi-index steps yield arrays, one level per step — not
    flattened). Descendant paths must resolve to exactly one match."""
    parsed = parse_path(path)
    if not parsed:
        # record root: the whole record as one struct value
        return df.withColumn(out_col, F.struct(*[F.col(c) for c in df.columns]))
    exp = _expand(df, parsed)
    if len(exp) != 1:
        raise ValueError(
            f"get_at_path needs exactly one concrete path, got {len(exp)} "
            f"matches for {path!r}"
        )
    segs = exp[0]
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
    if isinstance(head, int):
        return _get_steps(F.element_at(col, head + 1), tail, rest)
    kind = head[0]
    if kind == "idx":
        picked = F.array(*[F.element_at(col, i + 1) for i in head[1]])
        return F.transform(picked, lambda e: _get_steps(e, tail, rest))
    if kind == "mapstar":
        return F.transform(
            F.map_values(col), lambda v: _get_steps(v, tail, rest)
        )
    if kind == "key":
        keys = head[1]
        if len(keys) == 1:
            return _get_steps(col[keys[0]], tail, rest)
        picked = F.array(*[col[k] for k in keys])
        return F.transform(picked, lambda e: _get_steps(e, tail, rest))
    _, operand, op, val = head
    kept = F.filter(col, lambda e: _pred_col(e, operand, op, val))
    return F.transform(kept, lambda e: _get_steps(e, tail, rest))


def delete_at_path(df: DataFrame, path: str) -> DataFrame:
    """Remove the struct field at ``path`` (≙ RemoveRecordField with a
    nested target). The leaf must be a struct field (not an array slot)."""
    parsed = parse_path(path)
    if not parsed:
        raise ValueError("delete_at_path cannot delete the record root")
    for segs in _expand(df, parsed):
        leaf, steps = segs[-1]
        if steps or leaf == "*":
            raise ValueError("delete_at_path targets a named struct field")
        parents = segs[:-1]
        if not parents:
            df = df.drop(leaf)
            continue
        name, psteps = parents[0]
        dropper = lambda c: c.dropFields(leaf)  # noqa: E731
        df = df.withColumn(
            name, _apply_steps(F.col(name), psteps, parents[1:], dropper)
        )
    return df


def _unparse(segs: list[Seg]) -> list[str]:
    def _step(s):
        if isinstance(s, int) or s == "*":
            return f"[{s}]"
        if s[0] == "idx":
            return "[" + ",".join(str(i) for i in s[1]) + "]"
        if s[0] == "mapstar":
            return "['*']"
        if s[0] == "key":
            return "[" + ",".join(f"'{k}'" for k in s[1]) + "]"
        _, operand, op, val = s
        lit = f"'{val}'" if isinstance(val, str) else str(val)
        return f"[./{operand} {op} {lit}]" if operand != "." else f"[. {op} {lit}]"

    return [name + "".join(_step(s) for s in steps) for name, steps in segs]
