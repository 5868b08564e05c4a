"""Local replica of the driver's correctness harness: run a Spark query
and its DuckDB oracle side-by-side, compare row count, column names, and
order-insensitive values (exact for ints/strings; 1e-9-tolerant for
floats — both sides round before output, so this is belt-and-braces)."""

from __future__ import annotations

import math

import duckdb
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


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "tolist"):  # numpy arrays / list cells
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(_norm_cell(v) for v in row))
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
    mismatches = [(x, y) for x, y in zip(a, b) if not _row_eq(x, y)]
    report["n_value_mismatches"] = len(mismatches)
    report["first_mismatches"] = mismatches[:3]
    report["ok"] = len(mismatches) == 0
    return report


def _cell_eq(x, y) -> bool:
    if x is None and y is None:
        return True
    if isinstance(x, tuple) and isinstance(y, tuple):
        return len(x) == len(y) and all(_cell_eq(a, b) for a, b in zip(x, y))
    if isinstance(x, float) or isinstance(y, float):
        try:
            if x is None or y is None:
                return False
            return math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return x == y


def _row_eq(x: tuple, y: tuple) -> bool:
    return len(x) == len(y) and all(_cell_eq(a, b) for a, b in zip(x, y))


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from beehive_data_etl_spark.plans.queries import ORACLES, QUERIES

    con = duckdb_conn(sf_dir)
    results = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name in ORACLES:
            odf = con.execute(ORACLES[name]).df()
            results[name] = compare(sdf, odf)
        else:
            results[name] = {"ok": len(sdf) >= 0, "rows_only": True, "rows": len(sdf)}
    return results
