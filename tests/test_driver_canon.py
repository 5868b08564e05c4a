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


def test_driver_canon_crashes_on_single_complex_column():
    """ADVICE r04: a frame whose ONLY column is complex-typed used to
    slip through (single-column sort_values takes the argsort
    comparison path and astype(str) made hashing safe). The factorize
    probe now raises for it just like the driver's raw-cell hash."""
    bad = pd.DataFrame({"v": [["a", "b"], ["c"]]})
    with pytest.raises(TypeError):
        driver_canon(bad)
    report = compare(bad.copy(), bad.copy())
    assert report["driver_canon_ok"] is False and report["ok"] is False


def test_driver_canon_crashes_on_dict_and_ndarray_cells():
    import numpy as np

    for cell in ({"a": 1}, np.array([1, 2])):
        bad = pd.DataFrame({"v": [cell]})
        with pytest.raises(TypeError):
            driver_canon(bad)


# ---- VERDICT r04 item 7: property-test the canonicalizer clone ------
# The driver's algorithm is sort-columns-by-name -> sort_values by all
# columns -> hash cells; any frame of hashable scalars must canonicalize
# deterministically and order-insensitively, and any unhashable cell
# must raise. Pinning these properties over random frames means a
# silent driver-harness change (or a regression in the clone) shows up
# locally first instead of as a red CORRECTNESS row.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.pandas import column, data_frames, range_indexes

_scalar_cols = st.lists(
    st.sampled_from(
        [
            ("i", st.integers(min_value=-10, max_value=10)),
            ("f", st.one_of(st.just(float("nan")), st.floats(-5, 5, allow_nan=False))),
            ("s", st.one_of(st.none(), st.text(alphabet="abXY|,", max_size=4))),
            ("b", st.booleans()),
        ]
    ),
    min_size=1,
    max_size=4,
)


@st.composite
def _frames(draw):
    specs = draw(_scalar_cols)
    cols = [
        column(name=f"c{i}_{tag}", elements=elems, dtype=object)
        for i, (tag, elems) in enumerate(specs)
    ]
    return draw(data_frames(columns=cols, index=range_indexes(min_size=1, max_size=8)))


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pdf=_frames(), seed=st.integers(min_value=0, max_value=2**16))
def test_driver_canon_order_insensitive_on_random_frames(pdf, seed):
    """The canonical hash multiset is invariant to row order AND column
    order (the driver sorts both away), and stable across calls."""
    base = sorted(driver_canon(pdf).tolist())
    shuffled_rows = pdf.sample(frac=1.0, random_state=seed)
    shuffled_cols = shuffled_rows[list(reversed(pdf.columns))]
    assert sorted(driver_canon(shuffled_rows).tolist()) == base
    assert sorted(driver_canon(shuffled_cols).tolist()) == base
    assert sorted(driver_canon(pdf).tolist()) == base


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pdf=_frames(), data=st.data())
def test_driver_canon_raises_on_any_injected_unhashable(pdf, data):
    """Planting ONE unhashable cell anywhere — any row, any column,
    including frames reduced to a single column — always raises."""
    row = data.draw(st.integers(min_value=0, max_value=len(pdf) - 1))
    col = data.draw(st.sampled_from(list(pdf.columns)))
    poison = data.draw(st.sampled_from([[1, 2], {"k": 1}]))
    bad = pdf.copy()
    bad[col] = bad[col].astype(object)
    bad.iat[row, bad.columns.get_loc(col)] = poison
    with pytest.raises(TypeError):
        driver_canon(bad)
    with pytest.raises(TypeError):
        driver_canon(bad[[col]])
