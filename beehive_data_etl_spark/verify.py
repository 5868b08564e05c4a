"""Final-state verifier (SURVEY.md §2 A13): byte-equal token arrays per
doc_id between the engine's merged table and two independent oracles
(BASELINE.json:6,15).

Oracle 1 (Spark, one declarative pass): batch-read the whole log,
global LWW reduction, drop keys whose last op is 'D'.
Oracle 2 (DuckDB, fully independent engine):
``QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY op_sequence
DESC) = 1`` then filter deletes.

``array<int32>`` element-wise equality IS byte-equality of the packed
arrays (fixed-width elements); an md5 over the comma-joined tokens is
also reported as a cross-engine checksum.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.lww import lww_dedup


def oracle_final_spark(spark: SparkSession, log_dir: str) -> DataFrame:
    from beehive_data_etl_spark.sources.readers import read_wal

    log = read_wal(spark, log_dir)
    last = lww_dedup(log.drop("event_ts", "batch_hint"), "doc_id", "op_sequence")
    return last.filter(F.col("op") != "D").drop("op")


def oracle_final_duckdb(log_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(log_dir, "part-*.parquet")))
    con = duckdb.connect()
    q = f"""
        SELECT * EXCLUDE (op, event_ts, batch_hint)
        FROM read_parquet({files!r}, union_by_name=true)
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY op_sequence DESC) = 1
          AND op != 'D'
        ORDER BY doc_id
    """
    return con.execute(q).df()


def token_checksums(df: DataFrame) -> DataFrame:
    """(doc_id, n_tok, md5-of-token-csv) — a compact equality witness."""
    return df.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.md5(F.concat_ws(",", F.col("tokens").cast("array<string>"))).alias("tokens_md5"),
    )


def compare_final(engine_df: DataFrame, oracle_df: DataFrame) -> dict:
    """Full-outer join on doc_id; count per-row token-array mismatches.
    Returns a report dict; report['ok'] is the gate."""
    e = engine_df.select(
        F.col("doc_id"), F.col("tokens").alias("e_tokens"),
        F.col("op_sequence").alias("e_seq"),
    )
    o = oracle_df.select(
        F.col("doc_id"), F.col("tokens").alias("o_tokens"),
        F.col("op_sequence").alias("o_seq"),
    )
    joined = e.join(o, "doc_id", "full_outer")
    report_df = joined.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("e_seq").isNull(), 1).otherwise(0)).alias("missing_in_engine"),
        F.sum(F.when(F.col("o_seq").isNull(), 1).otherwise(0)).alias("missing_in_oracle"),
        F.sum(
            F.when(~F.col("e_tokens").eqNullSafe(F.col("o_tokens")), 1).otherwise(0)
        ).alias("token_mismatches"),
        F.sum(
            F.when(~F.col("e_seq").eqNullSafe(F.col("o_seq")), 1).otherwise(0)
        ).alias("seq_mismatches"),
    ).collect()[0]
    report = report_df.asDict()
    report["ok"] = (
        report["missing_in_engine"] == 0
        and report["missing_in_oracle"] == 0
        and report["token_mismatches"] == 0
        and report["seq_mismatches"] == 0
    )
    return report
