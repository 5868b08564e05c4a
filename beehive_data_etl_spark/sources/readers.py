"""Schema-aware WAL reading (SURVEY.md §2 A1/A9).

Spark's ``mergeSchema`` refuses widening merges (int32 vs int64 n_tok
in an evolving log), so the WAL reader groups files by their parquet
footer schema, evolves a superset schema with the engine's widen-only
rule, reads each group with its *stored* schema, and aligns
declaratively (casts + typed nulls fold into the scan).

Footer inspection is driver-side metadata only — at cluster scale the
schema history comes from the table catalog / WAL DDL records instead
of file footers; the grouping logic is identical.
"""

from __future__ import annotations

import glob
import os
from functools import reduce

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.pandas.types import from_arrow_schema

from beehive_data_etl_spark.operators.schema_evolution import (
    align_to_schema,
    evolve_schema,
)


def wal_files(log_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(log_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {log_dir}")
    return files


def schema_groups(paths: list[str]) -> tuple[T.StructType, dict[str, list[str]]]:
    """(evolved superset schema, {schema_ddl: [paths]}) for a file set."""
    groups: dict[str, list[str]] = {}
    schemas: dict[str, T.StructType] = {}
    for p in paths:
        s = from_arrow_schema(pq.read_schema(p))
        key = s.simpleString()
        groups.setdefault(key, []).append(p)
        schemas[key] = s
    evolved = reduce(
        lambda acc, s: evolve_schema(acc, s)[0], list(schemas.values())[1:],
        list(schemas.values())[0],
    )
    return evolved, {k: groups[k] for k in groups}


def read_wal(spark: SparkSession, paths_or_dir: list[str] | str) -> DataFrame:
    """Read WAL parquet files (possibly spanning schema versions) as one
    DataFrame under the evolved superset schema."""
    paths = wal_files(paths_or_dir) if isinstance(paths_or_dir, str) else paths_or_dir
    evolved, groups = schema_groups(paths)
    parts = []
    for ddl_key, ps in groups.items():
        df = spark.read.parquet(*ps)
        parts.append(align_to_schema(df, evolved))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
