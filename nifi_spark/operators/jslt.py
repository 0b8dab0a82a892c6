"""JSLT subset → Catalyst compiler (JSLTTransformJSON, Spark-first).

The reference's JSLT bundle (nifi-extension-bundles/nifi-jslt-bundle/
.../jslt/JSLTTransformJSON.java) parses a JSLT program with the public
schibsted/jslt library and evaluates it per FlowFile JSON tree. The
set-oriented restatement compiles the SAME program text, against the input
column's schema, into one Catalyst expression tree — struct/map
constructors, getField chains, when/otherwise, comparison and arithmetic
ops — whole-stage-codegen'd, no per-row JSON walking, no Python.

Supported subset (the shapes the reference's own test fixtures use —
simpleTransform / dynamicKeyTransform / expressionLanguageTransform):

- object constructors ``{ "k": <expr>, ... }`` with nesting, and the
  ``"*" : .`` matcher (copy input fields not already named);
- ``for (<expr>) <key-expr> : <value-expr>`` object comprehensions with
  ``.key`` / ``.value`` bindings — over a MAP column (dynamic keys →
  ``map_from_entries(transform(map_entries(...)))``) or over a STRUCT
  (keys are schema-static → compiled to a map with literal keys);
- dot paths ``.a.b``, quoted steps ``."value"``, array index ``.a[0]``,
  and ``.`` (the current node); a path step missing from the schema
  yields null (JSLT semantics) rather than failing;
- literals (string / number / boolean / null), array literals;
- ``if (<cond>) <expr> else <expr>`` (missing else → null branch);
- operators ``== != < <= > >= + - * / and or`` (``+`` concatenates when
  both sides are strings, adds otherwise);
- functions: ``size`` ``uppercase`` ``lowercase`` ``trim`` ``number``
  ``string`` ``round`` ``floor`` ``ceiling`` ``not`` ``contains``
  ``is-array`` ``is-object`` ``is-string`` ``is-number`` (the ``is-*``
  tests resolve statically from the schema — they compile to literals);
- ``let name = <expr>`` bindings and ``$name`` references;
- ``def name(p, ...) <expr>`` user function declarations — inlined at
  every call site at compile time ($param bindings, ``.`` stays the
  caller's node), so the program remains ONE Catalyst expression;
  recursive defs raise by name (they cannot unroll into a finite tree).

Unsupported (raise ValueError, with the feature named):
object/array comprehension filters, ``import``, regex
functions, array slicing, recursive ``def``. Divergence note: JSLT drops object keys whose
value is null; a Spark struct has a fixed shape, so null-valued keys are
KEPT as null fields (schema-visible, documented here).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_-]*)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|[<>+\-*/.{}\[\]():,=])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"if", "else", "for", "and", "or", "let", "true", "false", "null", "def"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise ValueError(f"JSLT: cannot tokenize at {src[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    toks.append(("eof", ""))
    return toks


# ---------------------------------------------------------------------------
# parser — recursive descent to tuple AST
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        k, v = self.next()
        if v != text:
            raise ValueError(f"JSLT: expected {text!r}, got {v!r}")

    # program := (let)* expr
    def parse(self):
        lets = []
        defs: dict[str, tuple[list[str], object]] = {}
        while self.peek()[1] in ("let", "def") and self.peek()[0] == "name":
            _, kw = self.next()
            if kw == "let":
                _, name = self.next()
                self.expect("=")
                lets.append((name, self.or_expr()))
                continue
            # def name(p1, p2, ...) <expr> — params referenced as $p in body
            _, name = self.next()
            self.expect("(")
            params = []
            if self.peek()[1] != ")":
                params.append(self.next()[1])
                while self.peek()[1] == ",":
                    self.next()
                    params.append(self.next()[1])
            self.expect(")")
            defs[name] = (params, self.expr())
        body = self.expr()
        if self.peek()[0] != "eof":
            raise ValueError(f"JSLT: trailing input at {self.peek()[1]!r}")
        for name, val in reversed(lets):
            body = ("let", name, val, body)
        return ("defs", defs, body) if defs else body

    def expr(self):
        if self.peek() == ("name", "if"):
            self.next()
            self.expect("(")
            cond = self.expr()
            self.expect(")")
            then = self.expr()
            other = ("lit", None)
            if self.peek() == ("name", "else"):
                self.next()
                other = self.expr()
            return ("if", cond, then, other)
        return self.or_expr()

    def or_expr(self):
        node = self.and_expr()
        while self.peek() == ("name", "or"):
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.cmp_expr()
        while self.peek() == ("name", "and"):
            self.next()
            node = ("and", node, self.cmp_expr())
        return node

    def cmp_expr(self):
        node = self.add_expr()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = ("cmp", op, node, self.add_expr())
        return node

    def add_expr(self):
        node = self.mul_expr()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self.mul_expr())
        return node

    def mul_expr(self):
        node = self.unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = ("arith", op, node, self.unary())
        return node

    def unary(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        kind, val = self.peek()
        if val == "(":
            self.next()
            node = self.expr()
            self.expect(")")
            return node
        if val == "{":
            return self.object_()
        if val == "[":
            self.next()
            items = []
            if self.peek()[1] != "]":
                items.append(self.expr())
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.expr())
            self.expect("]")
            return ("array", items)
        if val == ".":
            return self.path()
        if kind == "string":
            self.next()
            return ("lit", _unquote(val))
        if kind == "number":
            self.next()
            return ("lit", float(val) if "." in val else int(val))
        if kind == "var":
            self.next()
            return ("var", val[1:])
        if kind == "name":
            if val in ("true", "false", "null"):
                self.next()
                return ("lit", {"true": True, "false": False, "null": None}[val])
            if val in _KEYWORDS:
                raise ValueError(f"JSLT: unexpected keyword {val!r}")
            self.next()
            self.expect("(")
            args = []
            if self.peek()[1] != ")":
                args.append(self.expr())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.expr())
            self.expect(")")
            return ("call", val, args)
        raise ValueError(f"JSLT: unexpected token {val!r}")

    def path(self):
        self.expect(".")
        steps: list = []
        # '.key'/'.value' inside for() are ordinary first steps
        while True:
            kind, val = self.peek()
            if kind == "name" and val not in _KEYWORDS:
                self.next()
                steps.append(("f", val))
            elif kind == "string":
                self.next()
                steps.append(("f", _unquote(val)))
            elif val == "[":
                self.next()
                k2, v2 = self.next()
                if k2 != "number" or "." in v2:
                    raise ValueError("JSLT: only integer array indexes are supported")
                self.expect("]")
                steps.append(("i", int(v2)))
            else:
                break
            if self.peek()[1] == ".":
                nk = self.toks[self.i + 1]
                # continue the chain only when '.' is followed by a step
                if nk[0] in ("name", "string") and nk[1] not in _KEYWORDS:
                    self.next()
                    continue
                break
            if self.peek()[1] == "[":
                continue
            break
        return ("path", steps)

    def object_(self):
        self.expect("{")
        if self.peek() == ("name", "for"):
            self.next()
            self.expect("(")
            src = self.expr()
            self.expect(")")
            key = self.expr()
            self.expect(":")
            val = self.expr()
            self.expect("}")
            return ("for", src, key, val)
        pairs = []
        matcher = False
        while self.peek()[1] != "}":
            k, v = self.next()
            if v == "*":
                self.expect(":")
                dot = self.expr()
                if dot != ("path", []):
                    raise ValueError('JSLT: only the "* : ." matcher is supported')
                matcher = True
            else:
                if k != "string":
                    raise ValueError(f"JSLT: object key must be a string, got {v!r}")
                self.expect(":")
                pairs.append((_unquote(v), self.expr()))
            if self.peek()[1] == ",":
                self.next()
        self.expect("}")
        return ("object", pairs, matcher)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t"}.get(m.group(1), m.group(1)), body)


# ---------------------------------------------------------------------------
# compiler — AST × input schema → (Column, DataType)
# ---------------------------------------------------------------------------


class _Ctx:
    """Compilation context: the current node ('.' binding), lets, user
    ``def`` functions, and the inline stack (recursion guard)."""

    def __init__(
        self,
        col: Column,
        dt: T.DataType,
        env: dict | None = None,
        defs: dict | None = None,
        inlining: frozenset | None = None,
    ):
        self.col = col
        self.dt = dt
        self.env = env or {}
        self.defs = defs or {}
        self.inlining = inlining or frozenset()

    def with_node(self, col: Column, dt: T.DataType) -> "_Ctx":
        return _Ctx(col, dt, self.env, self.defs, self.inlining)

    def with_var(self, name: str, col: Column, dt: T.DataType) -> "_Ctx":
        env = dict(self.env)
        env[name] = (col, dt)
        return _Ctx(self.col, self.dt, env, self.defs, self.inlining)


def _null() -> tuple[Column, T.DataType]:
    # built lazily: F.lit needs an active session (import-time safe)
    return F.lit(None), T.NullType()


def _compile(node, ctx: _Ctx) -> tuple[Column, T.DataType]:
    tag = node[0]
    if tag == "defs":
        _, defs, body = node
        return _compile(
            body, _Ctx(ctx.col, ctx.dt, ctx.env, {**ctx.defs, **defs}, ctx.inlining)
        )
    if tag == "lit":
        v = node[1]
        if v is None:
            return _null()
        dt = {bool: T.BooleanType(), int: T.LongType(), float: T.DoubleType(),
              str: T.StringType()}[type(v)]
        return F.lit(v), dt
    if tag == "var":
        if node[1] not in ctx.env:
            raise ValueError(f"JSLT: undefined variable ${node[1]}")
        return ctx.env[node[1]]
    if tag == "let":
        _, name, val, body = node
        c, dt = _compile(val, ctx)
        return _compile(body, ctx.with_var(name, c, dt))
    if tag == "path":
        return _compile_path(node[1], ctx)
    if tag == "if":
        _, cond, then, other = node
        cc, cdt = _compile(cond, ctx)
        tc, tdt = _compile(then, ctx)
        oc, odt = _compile(other, ctx)
        return F.when(cc, tc).otherwise(oc), _unify(tdt, odt)
    if tag in ("and", "or"):
        lc, _ = _compile(node[1], ctx)
        rc, _ = _compile(node[2], ctx)
        return (lc & rc if tag == "and" else lc | rc), T.BooleanType()
    if tag == "cmp":
        _, op, l, r = node
        lc, _ = _compile(l, ctx)
        rc, _ = _compile(r, ctx)
        ops = {"==": lc == rc, "!=": lc != rc, "<": lc < rc,
               "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc}
        return ops[op], T.BooleanType()
    if tag == "arith":
        _, op, l, r = node
        lc, ldt = _compile(l, ctx)
        rc, rdt = _compile(r, ctx)
        if op == "+" and isinstance(ldt, T.StringType) and isinstance(rdt, T.StringType):
            return F.concat(lc, rc), T.StringType()
        out_dt = _num_unify(ldt, rdt) if op != "/" else T.DoubleType()
        ops = {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}
        return ops[op], out_dt
    if tag == "neg":
        c, dt = _compile(node[1], ctx)
        return -c, dt
    if tag == "array":
        items = [_compile(it, ctx) for it in node[1]]
        el = T.NullType()
        for _, idt in items:
            el = _unify(el, idt)
        return F.array(*[c for c, _ in items]), T.ArrayType(el)
    if tag == "object":
        return _compile_object(node, ctx)
    if tag == "for":
        return _compile_for(node, ctx)
    if tag == "call":
        return _compile_call(node, ctx)
    raise ValueError(f"JSLT: unhandled node {tag!r}")


def _compile_path(steps, ctx: _Ctx) -> tuple[Column, T.DataType]:
    col, dt = ctx.col, ctx.dt
    for kind, s in steps:
        if kind == "f":
            if isinstance(dt, T.StructType):
                names = {f.name: f.dataType for f in dt.fields}
                if s not in names:
                    return _null()  # JSLT: missing key -> null
                col, dt = col[s], names[s]
            elif isinstance(dt, T.MapType):
                col, dt = col[s], dt.valueType
            else:
                return _null()
        else:  # index
            if not isinstance(dt, T.ArrayType):
                return _null()
            col, dt = F.element_at(col, s + 1), dt.elementType
    return col, dt


def _compile_object(node, ctx: _Ctx) -> tuple[Column, T.DataType]:
    _, pairs, matcher = node
    names = [k for k, _ in pairs]
    compiled = [(k, *_compile(v, ctx)) for k, v in pairs]
    if matcher:
        if not isinstance(ctx.dt, T.StructType):
            raise ValueError('JSLT: "* : ." needs an object (struct) input node')
        for f in ctx.dt.fields:
            if f.name not in names:
                compiled.append((f.name, ctx.col[f.name], f.dataType))
    fields = [c.alias(k) for k, c, _ in compiled]
    out_dt = T.StructType([T.StructField(k, dt, True) for k, _, dt in compiled])
    return F.struct(*fields), out_dt


def _compile_for(node, ctx: _Ctx) -> tuple[Column, T.DataType]:
    _, src, key_e, val_e = node
    scol, sdt = _compile(src, ctx)
    if isinstance(sdt, T.MapType):
        # dynamic keys — genuine map comprehension
        kv = T.StructType(
            [T.StructField("key", sdt.keyType), T.StructField("value", sdt.valueType)]
        )

        def body(e):
            ictx = ctx.with_node(e, kv)
            kc, _ = _compile(key_e, ictx)
            vc, _ = _compile(val_e, ictx)
            return F.struct(kc.alias("k"), vc.alias("v"))

        # value type resolved once against the entry schema
        probe = ctx.with_node(F.lit(None), kv)
        _, kdt = _compile(key_e, probe)
        _, vdt = _compile(val_e, probe)
        out = F.map_from_entries(F.transform(F.map_entries(scol), body))
        return out, T.MapType(kdt, vdt)
    if isinstance(sdt, T.StructType):
        # schema-static keys -> map with literal keys (uniform value type)
        entries = []
        vdt_u: T.DataType = T.NullType()
        kdt_u: T.DataType = T.NullType()
        for f in sdt.fields:
            kv = T.StructType(
                [T.StructField("key", T.StringType()), T.StructField("value", f.dataType)]
            )
            e = F.struct(F.lit(f.name).alias("key"), scol[f.name].alias("value"))
            ictx = ctx.with_node(e, kv)
            kc, kdt = _compile(key_e, ictx)
            vc, vdt = _compile(val_e, ictx)
            kdt_u, vdt_u = _unify(kdt_u, kdt), _unify(vdt_u, vdt)
            entries.append(F.struct(kc.alias("k"), vc.alias("v")))
        return F.map_from_entries(F.array(*entries)), T.MapType(kdt_u, vdt_u)
    raise ValueError(f"JSLT: for() needs an object or map, got {sdt.simpleString()}")


def _compile_call(node, ctx: _Ctx) -> tuple[Column, T.DataType]:
    _, fn, args = node
    ca = [_compile(a, ctx) for a in args]

    def a(i):
        return ca[i][0]

    if fn == "size":
        dt = ca[0][1]
        if isinstance(dt, (T.ArrayType, T.MapType)):
            return F.size(a(0)), T.IntegerType()
        if isinstance(dt, T.StructType):
            return F.lit(len(dt.fields)), T.IntegerType()
        return F.length(a(0).cast("string")), T.IntegerType()
    if fn in ("uppercase", "lowercase", "trim"):
        f = {"uppercase": F.upper, "lowercase": F.lower, "trim": F.trim}[fn]
        return f(a(0).cast("string")), T.StringType()
    if fn == "number":
        return a(0).cast("double"), T.DoubleType()
    if fn == "string":
        return a(0).cast("string"), T.StringType()
    if fn in ("round", "floor", "ceiling"):
        f = {"round": F.round, "floor": F.floor, "ceiling": F.ceil}[fn]
        return f(a(0)).cast("long"), T.LongType()
    if fn == "not":
        return ~a(0), T.BooleanType()
    if fn == "contains":
        return F.array_contains(a(1), a(0)), T.BooleanType()
    if fn.startswith("is-"):
        dt = ca[0][1]
        checks = {
            "is-array": isinstance(dt, T.ArrayType),
            "is-object": isinstance(dt, (T.StructType, T.MapType)),
            "is-string": isinstance(dt, T.StringType),
            "is-number": isinstance(dt, (T.LongType, T.IntegerType, T.DoubleType,
                                         T.FloatType, T.DecimalType)),
        }
        if fn in checks:
            # schema-static: the column's type is known at compile time
            return F.lit(bool(checks[fn])), T.BooleanType()
    if fn in ctx.defs:
        # user `def`: inline at the call site — args bind to $param vars,
        # `.` stays the caller's current node (JSLT functions do not
        # rebind the context node). Compile-time expansion keeps the
        # whole program one Catalyst expression; recursion cannot unroll
        # into a finite tree, so it raises by name.
        if fn in ctx.inlining:
            raise ValueError(f"JSLT: recursive def {fn!r} is unsupported")
        params, body = ctx.defs[fn]
        if len(args) != len(params):
            raise ValueError(
                f"JSLT: def {fn!r} takes {len(params)} args, got {len(args)}"
            )
        ictx = _Ctx(ctx.col, ctx.dt, ctx.env, ctx.defs, ctx.inlining | {fn})
        for p, (ac, adt) in zip(params, ca):
            ictx = ictx.with_var(p, ac, adt)
        return _compile(body, ictx)
    raise ValueError(f"JSLT: unsupported function {fn!r}")


def _unify(a: T.DataType, b: T.DataType) -> T.DataType:
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    return _num_unify(a, b)


def _num_unify(a: T.DataType, b: T.DataType) -> T.DataType:
    nums = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType)
    if isinstance(a, nums) and isinstance(b, nums):
        if isinstance(a, (T.DoubleType, T.FloatType)) or isinstance(b, (T.DoubleType, T.FloatType)):
            return T.DoubleType()
        return T.LongType()
    raise ValueError(
        f"JSLT: cannot unify types {a.simpleString()} / {b.simpleString()}"
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def jslt_compile(program: str, dt: T.DataType):
    """Parse ``program`` once; return ``(fn(col) -> Column, out_datatype)``
    for input columns of type ``dt``."""
    ast = _Parser(_tokenize(program)).parse()

    def apply(col: Column) -> Column:
        out, _ = _compile(ast, _Ctx(col, dt))
        return out

    _, out_dt = _compile(ast, _Ctx(F.lit(None), dt))
    return apply, out_dt


def jslt_transform(df: DataFrame, col: str, program: str) -> DataFrame:
    """Apply a JSLT program to struct column ``col`` (EACH_OBJECT strategy
    of JSLTTransformJSON: one record per row, transformed in place)."""
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[col]
    apply, _ = jslt_compile(program, dt)
    return df.withColumn(col, apply(F.col(col)))
