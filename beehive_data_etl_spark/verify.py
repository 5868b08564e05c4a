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


def oracle_patch_final_spark(spark: SparkSession, log_dir: str) -> DataFrame:
    """Independent per-cell oracle for PATCH logs
    (``eventlog.generate_patch_log``): winner-seq per cell via
    conditional max + join-back — a deliberately different formulation
    from the engine's ``max_by`` fold (same shape as q_patch_fold's
    DuckDB oracle). Live rows only; verbatim duplicate deliveries
    collapse via the final per-key dedup."""
    from beehive_data_etl_spark.sources.readers import read_wal

    log = read_wal(spark, log_dir).drop("event_ts", "batch_hint")
    full = F.col("op") != "P"
    e = log.select(
        "doc_id",
        "op_sequence",
        "op",
        "tokens",
        "n_tok",
        "source",
        (full | F.array_contains("patch_cols", "tokens")).alias("st"),
        (full | F.array_contains("patch_cols", "source")).alias("ss"),
    )
    w = e.groupBy("doc_id").agg(
        F.max("op_sequence").alias("op_sequence"),
        F.max(F.when(F.col("st"), F.col("op_sequence"))).alias("_tseq"),
        F.max(F.when(F.col("ss"), F.col("op_sequence"))).alias("_sseq"),
        F.max(F.when(F.col("op") != "P", F.col("op_sequence"))).alias("_eseq"),
    )
    ev_t = e.select(
        "doc_id",
        F.col("op_sequence").alias("_tseq"),
        F.when(F.col("op") != "D", F.col("tokens")).alias("tokens"),
        F.when(F.col("op") != "D", F.col("n_tok")).alias("n_tok"),
    ).dropDuplicates(["doc_id", "_tseq"])
    ev_s = e.select(
        "doc_id",
        F.col("op_sequence").alias("_sseq"),
        F.when(F.col("op") != "D", F.col("source")).alias("source"),
    ).dropDuplicates(["doc_id", "_sseq"])
    ev_e = e.select(
        "doc_id",
        F.col("op_sequence").alias("_eseq"),
        (F.col("op") == "D").alias("_deleted"),
    ).dropDuplicates(["doc_id", "_eseq"])
    return (
        w.join(ev_t, ["doc_id", "_tseq"], "left")
        .join(ev_s, ["doc_id", "_sseq"], "left")
        .join(ev_e, ["doc_id", "_eseq"], "left")
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .select("doc_id", "op_sequence", "tokens", "n_tok", "source")
    )


def oracle_txn_final_duckdb(log_dir: str, table_name: str) -> pd.DataFrame:
    """Independent replay of a TRANSACTIONAL multi-table log (see
    ``generate_txn_log``): apply only data events whose transaction is
    COMMITTED — a 'C' marker exists, no 'R' rollback, and the distinct
    data-event count equals the marker's ``txn_events`` (re-delivered
    duplicates collapse on op_sequence). Non-transactional rows (null
    txn_id) always apply. Then per-doc LWW, tombstones dropped."""
    files = sorted(glob.glob(os.path.join(log_dir, "part-*.parquet")))
    con = duckdb.connect()
    q = f"""
        WITH raw AS (
            SELECT * FROM read_parquet({files!r}, union_by_name=true)
        ),
        markers AS (
            SELECT txn_id,
                   max(txn_events) FILTER (op = 'C') AS expected,
                   bool_or(op = 'R') AS aborted
            FROM raw WHERE op IN ('C', 'R') GROUP BY txn_id
        ),
        data AS (SELECT * FROM raw WHERE op IN ('I', 'U', 'D')),
        counts AS (
            SELECT txn_id, count(DISTINCT op_sequence) AS c
            FROM data GROUP BY txn_id
        ),
        committed AS (
            SELECT m.txn_id FROM markers m JOIN counts c USING (txn_id)
            WHERE NOT m.aborted AND c.c = m.expected
        ),
        released AS (
            SELECT * FROM data
            WHERE txn_id IS NULL OR txn_id IN (SELECT txn_id FROM committed)
        )
        SELECT * EXCLUDE (op, event_ts, batch_hint, table_name, txn_id, txn_events)
        FROM released
        WHERE table_name = ?
        QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY op_sequence DESC) = 1
          AND op != 'D'
        ORDER BY doc_id
    """
    return con.execute(q, [table_name]).df()
