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


def parse_cef(df: DataFrame, line_col: str = "line") -> DataFrame:
    """CEFReader header fields + raw extension blob (k=v pairs)."""
    line = F.col(line_col)

    def g(i: int) -> Column:
        return F.regexp_extract(line, _CEF, i)

    return df.withColumns(
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


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile a Grok expression (%{TYPE:name}) to (regex, field names).

    ≙ GrokReader (reference .../serialization/GrokReader.java) for the
    primitive pattern subset; named groups become extraction columns.
    """
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        typ, _, name = m.group(1).partition(":")
        body = _GROK_PRIMITIVES[typ]
        if name:
            fields.append(name)
            return f"({body})"
        return f"(?:{body})"

    regex = re.sub(r"%\{([^}]+)\}", sub, pattern)
    return regex, fields


def parse_grok(df: DataFrame, line_col: str, pattern: str) -> DataFrame:
    """Apply a Grok pattern: one column per named capture."""
    regex, fields = grok_to_regex(pattern)
    line = F.col(line_col)
    return df.withColumns(
        {name: F.regexp_extract(line, regex, i + 1) for i, name in enumerate(fields)}
    )
