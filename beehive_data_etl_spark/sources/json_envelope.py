"""JSON change-event envelope parsing (SURVEY.md §2 A1/A2): the
Kafka/Debezium-style path where each record arrives as a JSON string.

``parse_json_envelope`` lifts a ``value: string`` column (plus optional
metadata) into the typed CDC envelope with ``from_json`` — unparseable
records surface as null ``doc_id``/``op_sequence`` and are caught by
``operators.validate`` rather than killing the stream. Works unchanged
on batch and streaming DataFrames (same expression)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JSON_ENVELOPE_DDL = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok long, source string, event_ts timestamp, lang string"
)


def parse_json_envelope(
    records: DataFrame, value_col: str = "value", keep_raw: bool = False
) -> DataFrame:
    parsed = records.withColumn(
        "_env", F.from_json(F.col(value_col), JSON_ENVELOPE_DDL)
    )
    cols = [F.col(f"_env.{f}").alias(f) for f in
            ["op", "op_sequence", "doc_id", "tokens", "n_tok", "source",
             "event_ts", "lang"]]
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    return parsed.select(*cols)
