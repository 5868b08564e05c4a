"""In-flight schema evolution: added columns and safe type widening
(SURVEY.md §2 A9; BASELINE.json:6 "schema evolution (added/widened
columns) is applied in-flight").

The reference's MongoDB collections are schemaless — fields appear and
disappear per source and per scrape (SURVEY.md §1.1). This module is
the disciplined Spark lift: an explicit, versioned StructType with a
widen-only evolution rule, mirroring Iceberg's schema-update commit
semantics with plain PySpark types.

Invariant (BASELINE.json:15): the ``tokens`` element type is NEVER
widened — byte-equality of token arrays demands ``array<int32>``
forever. ``evolve_schema`` raises on any array element-type change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# safe widenings, Iceberg-compatible: int→long, float→double, int/long→double
_WIDEN: dict[tuple[str, str], bool] = {
    ("integer", "long"): True,
    ("integer", "double"): True,
    ("long", "double"): True,
    ("float", "double"): True,
    ("short", "integer"): True,
    ("short", "long"): True,
    ("byte", "short"): True,
    ("byte", "integer"): True,
    ("byte", "long"): True,
    ("date", "timestamp"): True,
}


class SchemaEvolutionError(ValueError):
    pass


def _widened(old: T.DataType, new: T.DataType, path: str) -> T.DataType:
    """The wider of two types if the change is a legal widening."""
    if old == new:
        return old
    if isinstance(old, T.ArrayType) or isinstance(new, T.ArrayType):
        raise SchemaEvolutionError(
            f"array element evolution is forbidden at '{path}' "
            f"({old.simpleString()} → {new.simpleString()}); the tokens "
            "payload must stay byte-identical (BASELINE.json:15)"
        )
    key = (old.typeName(), new.typeName())
    rev = (new.typeName(), old.typeName())
    if _WIDEN.get(key):
        return new
    if _WIDEN.get(rev):  # incoming batch is NARROWER than table → keep table type
        return old
    raise SchemaEvolutionError(
        f"illegal type change at '{path}': {old.simpleString()} → {new.simpleString()}"
    )


def evolve_schema(table: T.StructType, batch: T.StructType) -> tuple[T.StructType, list[str]]:
    """Merge an incoming batch schema into the table schema.

    Returns ``(evolved_schema, ddl_log)`` where ``ddl_log`` lists the
    Iceberg-equivalent DDL statements this evolution represents
    (``ADD COLUMN`` / ``ALTER COLUMN … TYPE``) — on a cluster the
    IcebergSink executes these verbatim (SURVEY.md §7.4).
    """
    fields: list[T.StructField] = []
    ddl: list[str] = []
    batch_by_name = {f.name: f for f in batch.fields}
    for f in table.fields:
        if f.name in batch_by_name:
            wide = _widened(f.dataType, batch_by_name[f.name].dataType, f.name)
            if wide != f.dataType:
                ddl.append(f"ALTER COLUMN {f.name} TYPE {wide.simpleString()}")
            fields.append(T.StructField(f.name, wide, True))
        else:
            fields.append(T.StructField(f.name, f.dataType, True))  # dropped ⇒ nullable
    table_names = {f.name for f in table.fields}
    for f in batch.fields:
        if f.name not in table_names:
            ddl.append(f"ADD COLUMN {f.name} {f.dataType.simpleString()}")
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields), ddl


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed
    nulls, widened columns are cast. Purely declarative — Catalyst
    folds the casts into the scan, so old-schema files are read and
    widened in one pass with no extra shuffle."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            src = have[f.name]
            cols.append(
                F.col(f.name) if src.dataType == f.dataType
                else F.col(f.name).cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
