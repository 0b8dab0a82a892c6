"""NiFi Expression Language / RecordPath scalar functions → Spark columns.

The reference evaluates `${attr:func(...)}` chains with one evaluator
class per function (nifi-commons/nifi-expression-language/.../evaluation/
functions/, ≈115 files — inventory in SURVEY.md §2.7) and RecordPath
standalone functions (nifi-commons/nifi-record-path/.../functions/,
33 files). This module is the parity table: every EL/RecordPath scalar
with a deterministic, engine-expressible meaning maps to a
`pyspark.sql.functions` expression — JVM-side, codegen'd. Functions whose
NiFi semantics are environmental (hostname(), ip(), thread()) or
non-deterministic (random(), now() in the data path) are intentionally
absent: the engine forbids wall-clock/unseeded randomness in data paths
(FIXTURES.md §0).

Usage: ``el("substringAfter", F.col("x"), ":")`` or the EL_FUNCTIONS dict
directly. Each lambda takes Columns/literals in NiFi argument order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


EL_FUNCTIONS: dict[str, callable] = {
    # ---- string (EL .../functions/{Append,Prepend,...}Evaluator.java) ----
    "append": lambda s, x: F.concat(_c(s), _c(x)),
    "prepend": lambda s, x: F.concat(_c(x), _c(s)),
    "contains": lambda s, x: _c(s).contains(x),
    "startsWith": lambda s, x: _c(s).startswith(x),
    "endsWith": lambda s, x: _c(s).endswith(x),
    "indexOf": lambda s, x: F.instr(_c(s), x) - 1,  # NiFi is 0-based
    "lastIndexOf": lambda s, x: F.length(_c(s))
    - F.instr(F.reverse(_c(s)), F.reverse(_c(x)))
    - F.length(_c(x))
    + 1,
    "length": lambda s: F.length(_c(s)),
    "matches": lambda s, p: _c(s).rlike(p),
    "find": lambda s, p: F.regexp_extract(_c(s), p, 0) != "",
    "replace": lambda s, a, b: F.replace(_c(s), _c(a), _c(b)),
    "replaceFirst": lambda s, p, r: F.regexp_replace(_c(s), "^(.*?)" + p, "$1" + r),
    "replaceAll": lambda s, p, r: F.regexp_replace(_c(s), p, r),
    "replaceNull": lambda s, d: F.coalesce(_c(s), _c(d)),
    "replaceEmpty": lambda s, d: F.when(F.trim(_c(s)) == "", _c(d)).otherwise(_c(s)),
    "substring": lambda s, a, b=None: F.substr(
        _c(s), _c(a) + 1, _c((b - a) if b is not None else 2147483647)
    ),
    "substringBefore": lambda s, x: F.substring_index(_c(s), x, 1),
    "substringAfter": lambda s, x: F.when(
        F.instr(_c(s), x) > 0,
        F.substr(_c(s), F.instr(_c(s), x) + F.length(_c(x))),
    ).otherwise(_c(s)),
    "substringBeforeLast": lambda s, x: F.when(
        F.instr(_c(s), x) > 0,
        F.substr(
            _c(s),
            F.lit(1),
            F.length(_c(s))
            - F.length(F.substring_index(_c(s), x, -1))
            - F.length(_c(x)),
        ),
    ).otherwise(_c(s)),
    "substringAfterLast": lambda s, x: F.substring_index(_c(s), x, -1),
    "toUpper": lambda s: F.upper(_c(s)),
    "toLower": lambda s: F.lower(_c(s)),
    "trim": lambda s: F.trim(_c(s)),
    "padLeft": lambda s, n, p=" ": F.lpad(_c(s), n, p),
    "padRight": lambda s, n, p=" ": F.rpad(_c(s), n, p),
    "repeat": lambda s, n: F.repeat(_c(s), n),
    "getDelimitedField": lambda s, i, d=",": F.split(_c(s), d).getItem(i - 1),
    "escapeJson": lambda s: F.regexp_replace(
        F.regexp_replace(_c(s), r"\\", r"\\\\"), '"', r"\\\""
    ),
    # ---- math (Plus/Minus/...Evaluator.java) ----
    "plus": lambda a, b: _c(a) + _c(b),
    "minus": lambda a, b: _c(a) - _c(b),
    "multiply": lambda a, b: _c(a) * _c(b),
    "divide": lambda a, b: _c(a) / _c(b),
    "mod": lambda a, b: _c(a) % _c(b),
    "toRadix": lambda a, r: F.conv(_c(a).cast("string"), 10, r),
    "fromRadix": lambda a, r: F.conv(_c(a), r, 10).cast("long"),
    "abs": lambda a: F.abs(_c(a)),
    # ---- date/time (Format/StringToDate/...Evaluator.java) ----
    "toDate": lambda s, fmt: F.to_timestamp(_c(s), fmt),
    "format": lambda t, fmt: F.date_format(_c(t), fmt),
    "toNumber": lambda t: (F.unix_timestamp(_c(t)) * 1000),
    "fromEpochMillis": lambda n: F.timestamp_millis(_c(n).cast("long")),
    # ---- boolean / comparison ----
    "and": lambda a, b: _c(a) & _c(b),
    "or": lambda a, b: _c(a) | _c(b),
    "not": lambda a: ~_c(a),
    "equals": lambda a, b: _c(a) == _c(b),
    "equalsIgnoreCase": lambda a, b: F.lower(_c(a)) == F.lower(_c(b)),
    "gt": lambda a, b: _c(a) > _c(b),
    "ge": lambda a, b: _c(a) >= _c(b),
    "lt": lambda a, b: _c(a) < _c(b),
    "le": lambda a, b: _c(a) <= _c(b),
    "isNull": lambda a: _c(a).isNull(),
    "notNull": lambda a: _c(a).isNotNull(),
    "isEmpty": lambda a: _c(a).isNull() | (F.trim(_c(a)) == ""),
    "in": lambda a, *vals: _c(a).isin(*vals),
    "ifElse": lambda p, a, b: F.when(_c(p), _c(a)).otherwise(_c(b)),
    # ---- encoding / hash ----
    "base64Encode": lambda s: F.base64(_c(s).cast("binary")),
    "base64Decode": lambda s: F.unbase64(_c(s)).cast("string"),
    "urlEncode": lambda s: F.url_encode(_c(s)),
    "urlDecode": lambda s: F.url_decode(_c(s)),
    "hashMd5": lambda s: F.md5(_c(s).cast("binary")),
    "hashSha256": lambda s: F.sha2(_c(s).cast("binary"), 256),
    "hash": lambda s: F.xxhash64(_c(s)),
    "UUID5": lambda s, ns=None: F.md5(F.concat(_c(ns if ns is not None else ""), _c(s))),
    # ---- JSON (JsonPath*Evaluator.java) ----
    "jsonPath": lambda s, p: F.get_json_object(_c(s), p),
    "isJson": lambda s: F.try_parse_json(_c(s)).isNotNull(),
    # ---- RecordPath standalone functions (.../record/path/functions/) ----
    "concat": lambda *xs: F.concat(*[_c(x) for x in xs]),
    "coalesce": lambda *xs: F.coalesce(*[_c(x) for x in xs]),
    "count": lambda a: F.size(_c(a)),
    "join": lambda sep, arr: F.array_join(_c(arr), sep),
    "mapOf": lambda *kv: F.create_map(*[_c(x) for x in kv]),
    "toString": lambda a: _c(a).cast("string"),
    "toBytes": lambda a: _c(a).cast("binary"),
}


def el(name: str, *args) -> Column:
    """Dispatch a NiFi EL/RecordPath function by name → Spark Column."""
    try:
        fn = EL_FUNCTIONS[name]
    except KeyError:
        raise KeyError(
            f"EL function {name!r} not mapped (see SURVEY.md §2.7 for the "
            "deliberately-unmapped environmental/non-deterministic set)"
        ) from None
    return fn(*args)
