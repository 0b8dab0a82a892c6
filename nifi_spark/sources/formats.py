"""Record readers/writers — NiFi's serialization services, Spark-first.

Reference inventory (SURVEY.md §2.11,
nifi-record-serialization-services-bundle): Avro/CSV/JSON/XML/Parquet
readers+writers are `spark.read/write.format(...)` verbatim —
:func:`convert_record` is the whole of ConvertRecord
(reference .../standard/ConvertRecord.java). The line-oriented log
dialects (Grok, Syslog 3164/5424, CEF — GrokReader.java, SyslogReader.java,
CEFReader.java) become regexp-extraction recipes over a text column:
JVM-side `regexp_extract`, one pass, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC 3164: "<PRI>MMM dd HH:mm:ss host tag: message"
_SYSLOG_3164 = (
    r"^<(\d+)>([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) (\S+) ([^:\[]+)(?:\[(\d+)\])?: (.*)$"
)

# Minimal CEF: "CEF:0|vendor|product|version|sig|name|severity|extensions"
_CEF = r"^CEF:(\d+)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|(.*)$"

# RFC 5424: "<PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD [MSG]"
# where any header field may be the NILVALUE '-' and SD is '-' or one or
# more [id k="v" ...] elements (≙ Syslog5424Reader.java header columns).
_SYSLOG_5424 = (
    r"^<(\d+)>(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) "
    r"((?:-|(?:\[[^\]]*\])+))(?: (.*))?$"
)


def convert_record(
    spark, in_path: str, in_format: str, out_path: str, out_format: str, **options
) -> None:
    """ConvertRecord: schema-preserving format conversion (one line in Spark)."""
    spark.read.format(in_format).options(**options).load(in_path).write.format(
        out_format
    ).mode("overwrite").save(out_path)


def parse_syslog_3164(df: DataFrame, line_col: str = "line") -> DataFrame:
    """SyslogReader (RFC 3164) as regexp capture groups.

    Columns: pri, facility, severity, syslog_ts (string — 3164 has no
    year), host, tag, pid, message. Non-matching lines yield empty strings
    (route them out with `filter(col('host') == '')` ≙ the reader's
    unparseable relationship).
    """
    line = F.col(line_col)

    def g(i: int) -> Column:
        return F.regexp_extract(line, _SYSLOG_3164, i)

    pri = g(1).try_cast("int")
    return df.withColumns(
        {
            "pri": pri,
            "facility": (pri / 8).cast("int"),
            "severity": F.pmod(pri, F.lit(8)).cast("int"),
            "syslog_ts": g(2),
            "host": g(3),
            "tag": g(4),
            "pid": g(5).try_cast("int"),
            "message": g(6),
        }
    )


def parse_syslog_5424(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Syslog5424Reader (RFC 5424) as regexp capture groups, JVM-side.

    Header columns pri/facility/severity/version/syslog_ts/host/app/procid/
    msgid (NILVALUE '-' → NULL), plus the structured-data element:
    ``sd_id`` (first element's SD-ID) and ``sd_params``
    (map<string,string> of every ``k="v"`` pair across elements) —
    reference Syslog5424RecordReader.java flattens SD the same way.
    Non-matching lines yield NULL host (the reader's unparseable route).
    """
    line = F.col(line_col)

    def g(i: int) -> Column:
        return F.regexp_extract(line, _SYSLOG_5424, i)

    def nil(c: Column) -> Column:
        return F.when((c == "-") | (c == ""), F.lit(None)).otherwise(c)

    pri = g(1).try_cast("int")
    sd = g(8)
    kv = F.regexp_extract_all(sd, F.lit(r'(\w+)="([^"]*)"'), 1)
    vv = F.regexp_extract_all(sd, F.lit(r'(\w+)="([^"]*)"'), 2)
    return df.withColumns(
        {
            "pri": pri,
            "facility": (pri / 8).cast("int"),
            "severity": F.pmod(pri, F.lit(8)).cast("int"),
            "version": g(2).try_cast("int"),
            "syslog_ts": nil(g(3)),
            "host": nil(g(4)),
            "app": nil(g(5)),
            "procid": nil(g(6)),
            "msgid": nil(g(7)),
            "sd_id": nil(F.regexp_extract(sd, r"\[(\S+?)[ \]]", 1)),
            "sd_params": F.map_from_arrays(kv, vv),
            "message": nil(g(9)),
        }
    )


def cef_extensions_map(ext: Column) -> Column:
    """CEF extension blob ``k1=v1 k2=v2 with spaces`` → map<string,string>.

    Values may contain spaces (``msg=out of memory``); the boundary between
    entries is the next ``key=`` token (reference CEFReader.java parses
    extensions the same way via the parcefone grammar). Pure column
    expression: mark each boundary with \\x01, split, split each entry at
    its first '='.
    """
    marked = F.regexp_replace(ext, r" (\w+)=", "\x01$1=")
    entries = F.filter(F.split(marked, "\x01"), lambda e: e.contains("="))
    return F.map_from_entries(
        F.transform(
            entries,
            lambda e: F.struct(
                F.substring_index(e, "=", 1).alias("key"),
                F.substr(e, F.instr(e, "=") + F.lit(1), F.length(e)).alias("value"),
            ),
        )
    )


def parse_cef(
    df: DataFrame, line_col: str = "line", parse_extensions: bool = False
) -> DataFrame:
    """CEFReader header fields + extension k=v pairs.

    ``parse_extensions=True`` adds ``ext`` (map<string,string>) via
    :func:`cef_extensions_map`; the raw blob stays in ``extensions``.
    """
    line = F.col(line_col)

    def g(i: int) -> Column:
        return F.regexp_extract(line, _CEF, i)

    out = df.withColumns(
        {
            "cef_version": g(1).try_cast("int"),
            "vendor": g(2),
            "product": g(3),
            "device_version": g(4),
            "signature_id": g(5),
            "event_name": g(6),
            "cef_severity": g(7),
            "extensions": g(8),
        }
    )
    if parse_extensions:
        out = out.withColumn("ext", cef_extensions_map(F.col("extensions")))
    return out


# The handful of Grok primitives the reference's default patterns rely on
# (logstash-patterns core subset) — enough to compile common expressions.
_GROK_PRIMITIVES: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
}


# Composite patterns in the logstash pattern-file *format* (each line
# "NAME definition", definitions may reference other patterns) — written
# from the public grammar, resolved recursively by load_grok_patterns.
_GROK_COMPOSITES = """\
HOSTNAME \\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b
USERNAME [a-zA-Z0-9._-]+
MONTH \\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\\b
MONTHDAY (?:[ 0]?[1-9]|[12][0-9]|3[01])
TIME \\d{2}:\\d{2}:\\d{2}
SYSLOGTIMESTAMP %{MONTH} %{MONTHDAY} %{TIME}
IPORHOST (?:%{IP}|%{HOSTNAME})
SYSLOGPROG %{NOTSPACE}(?:\\[%{INT}\\])?
HTTPDATE %{MONTHDAY}/%{MONTH}/\\d{4}:%{TIME} [+-]\\d{4}
QUOTEDSTRING "(?:[^"\\\\]|\\\\.)*"
LOGLINE %{TIMESTAMP_ISO8601} %{LOGLEVEL} %{GREEDYDATA}
"""


def load_grok_patterns(text: str | None = None) -> dict[str, str]:
    """Parse a Grok pattern file ("NAME definition" per line, '#' comments)
    and resolve %{NAME} references recursively against the primitives.

    ≙ GrokReader's pattern-file property (reference
    .../serialization/GrokReader.java loads the logstash pattern library
    the same way). Returns a fully-resolved name → plain-regex dict; pass
    it to :func:`parse_grok` as ``patterns``.
    """
    raw = dict(_GROK_PRIMITIVES)
    for line in (_GROK_COMPOSITES + (text or "")).splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        name, _, body = line.partition(" ")
        raw[name] = body

    resolved: dict[str, str] = {}

    def resolve(name: str, seen: tuple = ()) -> str:
        if name in resolved:
            return resolved[name]
        if name in seen:
            raise ValueError(f"recursive grok pattern: {name}")
        body = re.sub(
            r"%\{(\w+)\}",
            lambda m: f"(?:{resolve(m.group(1), seen + (name,))})",
            raw[name],
        )
        resolved[name] = body
        return body

    for name in raw:
        resolve(name)
    return resolved


def grok_to_regex(
    pattern: str, patterns: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Compile a Grok expression (%{TYPE:name}) to (regex, field names).

    ≙ GrokReader (reference .../serialization/GrokReader.java); named
    groups become extraction columns. ``patterns`` defaults to the
    built-in primitive set; pass :func:`load_grok_patterns` output for the
    composite library / custom pattern files.
    """
    fields: list[str] = []
    defs = patterns if patterns is not None else _GROK_PRIMITIVES

    def sub(m: re.Match) -> str:
        typ, _, name = m.group(1).partition(":")
        body = defs[typ]
        if name:
            fields.append(name)
            return f"({body})"
        return f"(?:{body})"

    regex = re.sub(r"%\{([^}]+)\}", sub, pattern)
    return regex, fields


def parse_grok(
    df: DataFrame,
    line_col: str,
    pattern: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Apply a Grok pattern: one column per named capture."""
    # resolved composite bodies may carry their own groups — force them
    # non-capturing so capture index i+1 addresses exactly the i-th named
    # field
    defs = {
        k: re.sub(r"\((?!\?)", "(?:", v)
        for k, v in (patterns if patterns is not None else _GROK_PRIMITIVES).items()
    }
    regex, fields = grok_to_regex(pattern, defs)
    line = F.col(line_col)
    return df.withColumns(
        {name: F.regexp_extract(line, regex, i + 1) for i, name in enumerate(fields)}
    )


def parse_xml(df: DataFrame, xml_col: str, schema) -> DataFrame:
    """XMLReader: parse an XML-string column against a StructType/DDL
    schema (Spark 4's built-in from_xml — reference XMLReader.java maps to
    the native XML source; file-level reads are
    ``spark.read.format('xml')``). Adds ``parsed`` (struct).
    """
    return df.withColumn("parsed", F.from_xml(F.col(xml_col), schema))


#: return-type name → pyspark xpath function (all JVM-side Hive UDFs, so
#: the whole evaluation stays out of Python). ``nodeset`` yields
#: array<string> of matched text nodes, the reference's String List.
_XPATH_FNS = {
    "string": F.xpath_string,
    "long": F.xpath_long,
    "double": F.xpath_double,
    "boolean": F.xpath_boolean,
    "nodeset": F.xpath,
}


def evaluate_xpath(df: DataFrame, xml_col: str, exprs: dict) -> DataFrame:
    """EvaluateXPath: evaluate XPath expressions against an XML-string
    column and add each result as a typed column (reference
    nifi-standard-bundle .../EvaluateXPath.java:104-140 — dynamic
    property name → XPath expression, Destination=flowfile-attribute
    adds one attribute per expression; Return Type string/nodeset maps
    to ``string``/``nodeset`` here, with ``long``/``double``/``boolean``
    as the typed shortcuts XPath's number()/boolean() coercions give).

    ``exprs`` maps output column → ``(xpath, return_type)`` (or a bare
    xpath string, implying ``string``). A non-matching expression yields
    the type's zero value (empty string / 0 / false / empty array — the
    Hive xpath UDF coercion), mirroring the reference's "attributes will
    be created with empty strings" contract — never a routing failure.
    Evaluation is Spark's built-in Hive xpath UDF family: JVM-side,
    codegen-friendly, no Python in the hot path.
    """
    cols = {}
    for name, spec in exprs.items():
        xp, rt = (spec, "string") if isinstance(spec, str) else spec
        fn = _XPATH_FNS.get(rt)
        if fn is None:
            raise ValueError(
                f"evaluate_xpath: unknown return type {rt!r} for {name!r}; "
                f"expected one of {sorted(_XPATH_FNS)}"
            )
        cols[name] = fn(F.col(xml_col), F.lit(xp))
    return df.withColumns(cols)


_WINEVT_SCHEMA = (
    "System struct<Provider struct<_Name string>, EventID bigint, "
    "Level bigint, TimeCreated struct<_SystemTime string>, Computer string>, "
    "EventData struct<Data array<struct<_Name string, _VALUE string>>>"
)


def parse_windows_event_xml(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """WindowsEventLogReader: the Windows Event XML shape via native
    from_xml (reference WindowsEventLogReader.java flattens the same
    System header + EventData name/value pairs). Attributes use Spark's
    ``_`` prefix convention. Adds provider, event_id, level, time_created,
    computer, and ``event_data`` (map<string,string> of Data elements).
    """
    p = F.from_xml(F.col(xml_col), _WINEVT_SCHEMA)
    data = p.getField("EventData").getField("Data")
    return df.withColumns(
        {
            "provider": p.getField("System").getField("Provider").getField("_Name"),
            "event_id": p.getField("System").getField("EventID"),
            "level": p.getField("System").getField("Level"),
            "time_created": p.getField("System")
            .getField("TimeCreated")
            .getField("_SystemTime"),
            "computer": p.getField("System").getField("Computer"),
            "event_data": F.map_from_entries(
                F.transform(
                    F.coalesce(data, F.array()),
                    lambda d: F.struct(
                        d.getField("_Name").alias("key"),
                        d.getField("_VALUE").alias("value"),
                    ),
                )
            ),
        }
    )


def parse_yaml_tree(df: DataFrame, yaml_col: str, schema) -> DataFrame:
    """YamlTreeReader: YAML-string column → struct, via Arrow-batched
    mapInPandas (YAML has no JVM-side parser in Spark; each batch is
    yaml.safe_load → json so the typed decode stays in from_json on the
    JVM). Import-gated: raises if PyYAML is unavailable.
    """
    import json as _json

    import yaml  # noqa: F401 — import-gated dependency

    from pyspark.sql import types as T

    # fresh StructType — StructType.add would mutate df's cached schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_json", T.StringType())]
    )

    def to_json(batches):
        import pandas as pd  # local import: executor-side

        for pdf in batches:
            pdf = pdf.copy()
            pdf["_json"] = [
                _json.dumps(yaml.safe_load(s)) if s is not None else None
                for s in pdf[yaml_col]
            ]
            yield pdf

    with_json = df.mapInPandas(to_json, schema=out_schema)
    return with_json.withColumn("parsed", F.from_json(F.col("_json"), schema)).drop(
        "_json"
    )


def infer_json_schema(spark, df: DataFrame, json_col: str, sample: int | None = None):
    """Schema inference over a JSON-string column (tooling/exploration —
    reference SchemaInferenceEngine.java / FieldTypeInference.java's
    two-pass type widening ≙ Spark's JSON inference pass, which widens
    conflicting field types across rows the same way).

    Returns a StructType. Not for the hot path: production pipelines pass
    explicit schemas (SURVEY.md §1.3); this helper exists to *derive* that
    explicit schema once, offline, optionally from a row sample.
    """
    src = df.select(F.col(json_col).cast("string"))
    if sample is not None:
        src = src.limit(sample)
    return spark.read.json(src.rdd.map(lambda r: r[0])).schema
