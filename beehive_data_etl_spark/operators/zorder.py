"""Z-order (Morton-curve) clustering expression for multi-column
compaction layout.

``compact(cluster_by=[a, b])`` sorts linearly: row groups get TIGHT
ranges on ``a`` and useless full-span ranges on ``b`` — a predicate on
``b`` alone reads everything. Interleaving the bits of both columns'
quantized codes (the classic Morton/Z curve; Delta Lake's OPTIMIZE
ZORDER BY and the Databricks/Amazon literature use exactly this
construction) makes EVERY prefix of the sort key constrain EVERY
participating column, so each row group covers an axis-aligned
rectangle of roughly sqrt(n)-of-the-span per side — predicates on any
single clustered column (or any conjunction) skip most row groups.

Built entirely from JVM-side column expressions (shifts/ors inside
whole-stage codegen — no UDF, no extra shuffle: the z-value is a sort
key computed on the fly inside the rewrite's existing per-bucket
sort and dropped before the files are written).

Quantization:
- numeric columns scale ``(v - lo) / (hi - lo)`` into a 16-bit code;
  ``[lo, hi]`` comes from the snapshot's recorded per-column ranges
  (``col_ranges``, harvested from parquet footers at commit — zero
  extra I/O) with a one-job min/max fallback when a column has no
  usable recorded stats. NULL codes to 0 (sorts first, like NULLS
  FIRST).
- string columns take their leading two bytes as the code — prefix
  locality survives, so range predicates on prefixes keep pruning.

16 bits per column at 2-3 columns, 15 at 4 (the interleaved code must
stay inside the BIGINT's 63 value bits — a bit at position 63 would
flip the sign and sort half the 4th column's range FIRST). Beyond 4
columns Z-order stops helping (each column gets too few bits) —
refused rather than silently degraded."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_ZORDER_COLS = 4


def _bits_per_col(n: int) -> int:
    """16 bits per column, reduced so the interleaved code never
    touches the BIGINT sign bit: at 4 columns 16*4 = 64 would place a
    code bit at position 63, making half of the 4th column's range
    sort NEGATIVE — first instead of last, inverting the curve's most
    significant bit (review-found). 63 // n keeps every bit in
    [0, 62]: 2 cols -> 16, 3 -> 16, 4 -> 15."""
    return min(16, 63 // n)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
)


def zorder_supported(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.StringType, *_NUMERIC))


def _code16(col: Column, dtype: T.DataType, rng, bits: int) -> Column:
    """The column's ``bits``-bit quantized code as a non-null LONG in
    [0, 2^bits - 1]."""
    max_code = (1 << bits) - 1
    if isinstance(dtype, T.StringType):
        b1 = F.coalesce(F.ascii(F.substring(col, 1, 1)), F.lit(0)) % 256
        b2 = F.coalesce(F.ascii(F.substring(col, 2, 1)), F.lit(0)) % 256
        # 16-bit prefix code narrowed to the bit budget (drop the
        # LEAST significant bits — prefix locality survives)
        return F.shiftright((b1 * 256 + b2).cast("long"), 16 - bits)
    if isinstance(dtype, T.DateType):
        col = col.cast("int")
    lo, hi = float(rng[0]), float(rng[1])
    span = hi - lo
    if span <= 0:
        # constant column: every row codes to 0 (still a valid curve —
        # the other columns' bits order the data)
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(
        float(max_code)
    )
    code = F.floor(scaled).cast("long")
    # NOT greatest/least: those SKIP nulls (a NULL value would clamp
    # to 65535 instead of coding 0). when() propagates the NULL to
    # the coalesce.
    clamped = (
        F.when(code < 0, F.lit(0))
        .when(code > max_code, F.lit(max_code))
        .otherwise(code)
    )
    return F.coalesce(clamped, F.lit(0)).cast("long")


def zorder_expr(
    schema: T.StructType, cols: list[str], ranges: dict[str, list]
) -> Column:
    """The interleaved Morton code over ``cols`` as one BIGINT sort
    key. ``ranges``: column -> [min, max] for every non-string column
    (callers pass the snapshot's recorded ``col_ranges`` or a measured
    fallback). MSB-aligned: every code's top bit lands in the
    z-value's top bit group, so the curve orders coarse-to-fine; the
    per-column bit budget (_bits_per_col) keeps the whole code in
    bits [0, 62] — never the sign bit."""
    if not 2 <= len(cols) <= MAX_ZORDER_COLS:
        raise ValueError(
            f"zorder wants 2..{MAX_ZORDER_COLS} columns, got {len(cols)} "
            "(one column needs only a plain sort; beyond "
            f"{MAX_ZORDER_COLS} each column gets too few bits to prune)"
        )
    fields = {f.name: f.dataType for f in schema.fields}
    codes = []
    for c in cols:
        dtype = fields[c]
        if not zorder_supported(dtype):
            raise ValueError(
                f"zorder: unsupported type {dtype.simpleString()} for "
                f"column {c!r} (numeric, date or string)"
            )
        rng = None
        if not isinstance(dtype, T.StringType):
            rng = ranges.get(c)
            if not rng or len(rng) != 2 or rng[0] is None:
                raise ValueError(
                    f"zorder: no usable [min, max] for column {c!r}"
                )
        codes.append((c, dtype, rng))
    n = len(codes)
    bits = _bits_per_col(n)
    built = [_code16(F.col(c), dtype, rng, bits) for c, dtype, rng in codes]
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for j, code in enumerate(built):
            bitval = F.shiftright(code, bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bitval, bit * n + j))
    return z
