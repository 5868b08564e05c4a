"""Local replica of the driver's correctness harness: run a Spark query
and its DuckDB oracle side-by-side and compare row count, column names,
and an order-insensitive canonicalization of every value.

The comparison is deliberately TYPE-EXACT (round-1 lesson, VERDICT.md
"What's wrong" #2): the driver hashes dtype-canonicalized cells, so an
int64 ``25`` vs a float64 ``25.0`` is a mismatch even though the values
are numerically equal. The old 1e-9 ``isclose`` check masked exactly
that bug class (q_math's CEIL returning BIGINT in Spark but DOUBLE in
DuckDB). Every cell is canonicalized to a (type-tag, value) pair and
compared with plain ``==`` — local green now implies driver green.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    """Canonicalize one cell to a hashable (type-tag, value) pair.

    Type tags keep int/float/bool/str/decimal distinct — the property
    the driver's hash has and the old comparison lacked. Floats are
    compared by exact bits (both engines' queries round before output;
    round 1 proved the suite is bit-exact, so no tolerance is needed or
    wanted)."""
    if v is None:
        return None
    # float NaN BEFORE the pd.isna umbrella: a Spark NULL vs a DuckDB
    # NaN is a genuine engine divergence (e.g. 0/0 arithmetic) and must
    # NOT canonicalize identically. Caveat: a nullable-int column that
    # pandas widened to float64 represents NULL as NaN on BOTH sides
    # identically, so tagging NaN keeps those equal too.
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return ("f", "nan")
    # pandas NaT / NA umbrella — but NOT for arrays (pd.isna is
    # elementwise there)
    if not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v):
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", f if not math.isnan(f) else "nan")
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, np.ndarray):
        return tuple(_canon_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, str):
        return ("s", v)
    # Decimal and anything else: stringify with its type name so a
    # DECIMAL-vs-DOUBLE divergence still fails loudly
    return (type(v).__name__, str(v))


def _is_complex(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    return isinstance(dt, (ArrayType, MapType, StructType))


def driver_canon(pdf: pd.DataFrame) -> pd.Series:
    """Replicate the DRIVER's canonicalization mechanics (round-3
    lesson, VERDICT r03 items 1/4): the driver sorts columns by name,
    pandas-``sort_values`` the frame by ALL columns, then hashes cell
    values. Both steps require every cell to be hashable — a raw
    ``array<...>`` output column crashes it with ``TypeError:
    unhashable type: 'list'`` (the exact q_keyword_classify /
    q_collect_sorted red rows). Running this on every parity result
    makes any future driver-harness incompatibility fail locally first.

    Returns the per-row hash series (value unused by callers; the point
    is that it raises exactly when the driver's canonicalizer would).

    The hashability probe is per-column ``pd.factorize`` BEFORE the
    stringify (ADVICE r04): a frame whose ONLY column is complex-typed
    slips through ``sort_values`` (single-column sort takes the argsort
    comparison path, and list<list comparisons succeed) and
    ``astype(str)`` would then make ``hash_pandas_object`` safe —
    weaker than the driver, which hashes raw cells. ``factorize``
    builds a hash table over the raw values, so any unhashable cell
    raises ``TypeError`` regardless of column count."""
    cols = sorted(pdf.columns)
    for c in cols:
        pd.factorize(pdf[c])
    canon = pdf[cols].sort_values(by=cols).reset_index(drop=True)
    return pd.util.hash_pandas_object(canon.astype(str), index=False)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    report = {
        "rows": (len(spark_pdf), len(oracle_pdf)),
        "cols": (sorted(spark_pdf.columns), sorted(oracle_pdf.columns)),
    }
    report["rows_ok"] = len(spark_pdf) == len(oracle_pdf)
    report["cols_ok"] = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    if not (report["rows_ok"] and report["cols_ok"]):
        report["ok"] = False
        return report
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    report["n_value_mismatches"] = len(mismatches)
    report["first_mismatches"] = mismatches[:3]
    report["ok"] = len(mismatches) == 0
    # driver-harness compatibility: the driver's sort-then-hash must be
    # able to process BOTH frames (it crashed on round 3's two raw
    # array-output queries while this comparison stayed green)
    try:
        driver_canon(spark_pdf)
        driver_canon(oracle_pdf)
        report["driver_canon_ok"] = True
    except TypeError as exc:
        report["driver_canon_ok"] = False
        report["driver_canon_err"] = f"driver canonicalizer would crash: {exc}"
        report["ok"] = False
    return report


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from beehive_data_etl_spark.plans.queries import ORACLES, QUERIES

    con = duckdb_conn(sf_dir)
    results = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name for f in df.schema.fields if _is_complex(f.dataType)
        ]
        if complex_cols:
            # hard ban (round-3 red-row class): the driver canonicalizer
            # cannot hash array/map/struct cells, so no queries() entry
            # may emit one — serialize (concat_ws / to_json) instead
            results[name] = {
                "ok": False,
                "complex_output_columns": complex_cols,
            }
            continue
        sdf = df.toPandas()
        if name in ORACLES:
            odf = con.execute(ORACLES[name]).df()
            results[name] = compare(sdf, odf)
        else:
            results[name] = {"ok": len(sdf) >= 0, "rows_only": True, "rows": len(sdf)}
    return results
