"""Round-4 guard for the driver-canonicalizer bug class (VERDICT r03
items 1/4): the driver pandas-sorts each result frame by every column
and hashes cells, so a raw array/map/struct output column crashes it
(`TypeError: unhashable type: 'list'` — the q_keyword_classify /
q_collect_sorted red rows in CORRECTNESS_r03.json).

Three layers of defense, outer to inner:
- ``run_parity`` refuses any query whose Spark schema contains a
  complex type (checked lazily, before execution) — exercised for all
  102 queries by test_oracle_parity.py;
- ``compare`` runs ``driver_canon`` on both frames so a frame the
  driver cannot sort/hash fails the local gate even if the value
  comparison passes;
- this file pins the mechanics of both with tiny fixtures.
"""

import pandas as pd
import pytest

from beehive_data_etl_spark.plans.parity import compare, driver_canon, run_parity

SF = "/root/testdata/sf0.001"


def test_driver_canon_crashes_on_list_cells():
    """The exact round-3 failure mode: list-valued cells are unhashable
    under the driver's sort-then-hash."""
    bad = pd.DataFrame({"k": [1, 2], "v": [["a", "b"], ["c"]]})
    with pytest.raises(TypeError):
        driver_canon(bad)


def test_driver_canon_accepts_scalar_frames():
    ok = pd.DataFrame({"k": [2, 1], "v": ["b|a", "c"], "x": [1.5, None]})
    h = driver_canon(ok)
    assert len(h) == 2


def test_compare_fails_on_driver_incompatible_frame():
    """Even when values match exactly, compare() must go red if the
    driver's canonicalizer would crash — round 3 shipped two red rows
    precisely because the local harness was MORE tolerant than the
    driver's."""
    pdf = pd.DataFrame({"k": [1], "v": [["a"]]})
    report = compare(pdf.copy(), pdf.copy())
    assert report["driver_canon_ok"] is False
    assert report["ok"] is False


def test_no_query_emits_complex_columns_fixed_pair(spark):
    """The two round-3 offenders now emit '|'-joined strings and pass
    the full parity gate (including the driver_canon step)."""
    reports = run_parity(spark, SF, ["q_keyword_classify", "q_collect_sorted"])
    for name, report in reports.items():
        assert "complex_output_columns" not in report, (name, report)
        assert report["ok"], (name, report)
        assert report.get("driver_canon_ok") is True, (name, report)


def test_run_parity_refuses_complex_schema(spark, monkeypatch):
    """Plumbing pin: a registered query emitting a raw array column is
    rejected BEFORE execution with an explicit report."""
    from pyspark.sql import functions as F

    from beehive_data_etl_spark.plans import queries as Q

    def rogue(spark_, sf_dir):
        return (
            spark_.read.parquet(f"{sf_dir}/nation.parquet")
            .groupBy("n_regionkey")
            .agg(F.collect_list("n_name").alias("names"))
        )

    monkeypatch.setitem(Q.QUERIES, "q_rogue_array", rogue)
    report = run_parity(spark, SF, ["q_rogue_array"])["q_rogue_array"]
    assert report["ok"] is False
    assert report["complex_output_columns"] == ["names"]
