"""Record/field-level transforms — NiFi's "SELECT-list" processors.

Each function re-expresses one reference processor as a narrow DataFrame
projection (no shuffle, whole-stage-codegen'd):

- UpdateRecord (reference .../standard/UpdateRecord.java:139-161) →
  :func:`update_fields`
- RenameRecordField (RenameRecordField.java) → :func:`rename_fields`
- RemoveRecordField (RemoveRecordField.java) → :func:`remove_fields`
- FlattenJson (FlattenJson.java) → :func:`flatten_struct`
- AttributesToJSON (AttributesToJSON.java) → :func:`attrs_to_json`
- EvaluateJsonPath (EvaluateJsonPath.java) → :func:`extract_json_paths`
- ExtractText (ExtractText.java) → :func:`extract_regex`
- ReplaceText (ReplaceText.java) → :func:`replace_text`
- ForkRecord (ForkRecord.java:100-130, split/extract modes) →
  :func:`fork_record`
- SplitRecord / SplitText (SplitRecord.java:95-145, SplitText.java) →
  :func:`split_text_lines` (content chunking is a file-sizing concern in
  Spark; the logical 1→N op is the explode)
- ConvertRecord (ConvertRecord.java) is `spark.read.format(A)… .write
  .format(B)` — no operator needed.

All are projections: Catalyst prunes unused inputs and pushes surviving
predicates below them, which is exactly what NiFi's literal graph execution
cannot do (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def update_fields(df: DataFrame, **exprs: Column) -> DataFrame:
    """Set/overwrite fields: each kwarg = target column ← expression.

    ≙ UpdateRecord dynamic properties (RecordPath target ← literal/EL or
    RecordPath source, reference UpdateRecord.java:149-161). Nested targets
    use ``withField`` on the struct column from the caller side.
    """
    return df.withColumns(dict(exprs))


def rename_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """≙ RenameRecordField (reference RenameRecordField.java)."""
    return df.withColumnsRenamed(mapping)


def remove_fields(df: DataFrame, *names: str) -> DataFrame:
    """≙ RemoveRecordField; nested removal via struct.dropFields."""
    return df.drop(*names)


def flatten_struct(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten all struct columns into top-level columns.

    ≙ FlattenJson (reference FlattenJson.java, separator property).
    """
    cols: list[Column] = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            changed = True
            for sub in f.dataType.fields:
                cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}"))
        else:
            cols.append(F.col(f"`{f.name}`"))
    out = df.select(*cols)
    return flatten_struct(out, sep) if changed else out


def attrs_to_json(df: DataFrame, cols: list[str], out_col: str = "json") -> DataFrame:
    """Serialize named columns into one JSON string column.

    ≙ AttributesToJSON (reference AttributesToJSON.java, attributes-list
    property → JSON in content or attribute).
    """
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


def extract_json_paths(
    df: DataFrame, json_col: str, paths: dict[str, str]
) -> DataFrame:
    """Evaluate JsonPaths against a JSON string column → new columns.

    ≙ EvaluateJsonPath (reference EvaluateJsonPath.java, dynamic property =
    attribute name ← JsonPath). `get_json_object` is JVM-side; for full
    typed parsing use normalize.normalize_json with an explicit schema.
    """
    return df.withColumns(
        {name: F.get_json_object(F.col(json_col), path) for name, path in paths.items()}
    )


def extract_regex(
    df: DataFrame, src_col: str, patterns: dict[str, str], group: int = 1
) -> DataFrame:
    """Regex capture groups → columns (≙ ExtractText, ExtractText.java)."""
    return df.withColumns(
        {name: F.regexp_extract(F.col(src_col), pat, group) for name, pat in patterns.items()}
    )


def replace_text(
    df: DataFrame, col: str, pattern: str, replacement: str, literal: bool = False
) -> DataFrame:
    """Regex or literal find/replace (≙ ReplaceText, ReplaceText.java).

    Literal mode escapes the pattern (NiFi "Literal Replace" strategy).
    """
    import re as _re

    pat = _re.escape(pattern) if literal else pattern
    return df.withColumn(col, F.regexp_replace(F.col(col), pat, replacement))


def fork_record(
    df: DataFrame,
    array_col: str,
    mode: str = "split",
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """Explode an array-of-struct field into child rows.

    ≙ ForkRecord (reference ForkRecord.java:100-130): mode ``split`` keeps
    parent fields on every child, mode ``extract`` emits only the child
    record. `posexplode` preserves the element index as ``_pos`` (NiFi
    keeps array order implicitly).
    """
    parent = parent_cols if parent_cols is not None else [
        c for c in df.columns if c != array_col
    ]
    exploded = df.select(
        *([F.col(c) for c in parent] if mode == "split" else []),
        F.posexplode(F.col(array_col)).alias("_pos", "_child"),
    )
    child_type = next(f.dataType for f in df.schema.fields if f.name == array_col)
    if isinstance(child_type.elementType, T.StructType):
        return exploded.select(
            *(parent if mode == "split" else []), "_pos", "_child.*"
        )
    return exploded.withColumnRenamed("_child", array_col.rstrip("s") or "value")


def split_text_lines(df: DataFrame, text_col: str, line_sep: str = "\n") -> DataFrame:
    """Content → one row per line (≙ SplitText, SplitText.java)."""
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("line_idx", text_col),
    )
