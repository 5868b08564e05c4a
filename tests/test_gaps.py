"""operators/gaps.py — transport-integrity monitoring.

The invariant the block-stitched plan must keep: for ANY block_size,
``sequence_gap_ranges`` equals the single-window ground truth (maximal
missing runs between observed min and max). Duplicates never create
holes; per-group monitoring keys holes to their group; GapMonitor
catches cross-batch loss the per-batch views cannot see.
"""

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.gaps import (
    GapMonitor,
    sequence_gap_ranges,
    sequence_gap_summary,
)


def _truth(seqs):
    """Maximal missing runs of a sorted observed set — reference
    implementation in plain Python."""
    s = sorted(set(seqs))
    return [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(s, s[1:])
        if b - a > 1
    ]


SEQS = [0, 1, 2, 7, 8, 2, 1500, 1501, 1999, 2000, 2001, 5500, 9000, 9000]


@pytest.mark.parametrize("block_size", [2, 7, 1000, 1 << 20])
def test_gap_ranges_equal_ground_truth_any_block_size(spark, block_size):
    df = spark.createDataFrame([(s,) for s in SEQS], "op_sequence long")
    got = sorted(
        tuple(r)
        for r in sequence_gap_ranges(df, block_size=block_size)
        .select("gap_start", "gap_end", "gap_len")
        .collect()
    )
    assert got == _truth(SEQS)


def test_gap_ranges_grouped_and_dense_group_empty(spark):
    rows = [("a", s) for s in [1, 2, 10]] + [("b", s) for s in range(5, 9)]
    df = spark.createDataFrame(rows, "src string, op_sequence long")
    got = sequence_gap_ranges(df, by=["src"], block_size=4).collect()
    assert [(r.src, r.gap_start, r.gap_end, r.gap_len) for r in got] == [
        ("a", 3, 9, 7)
    ]  # b is dense: no rows


def test_gap_summary_counts(spark):
    df = spark.createDataFrame(
        [("a", s) for s in [1, 1, 2, 5]] + [("b", s) for s in [10]],
        "src string, op_sequence long",
    )
    rows = {
        r.src: r for r in sequence_gap_summary(df, by=["src"]).collect()
    }
    a = rows["a"]
    assert (a.n_events, a.n_distinct, a.n_dups) == (4, 3, 1)
    assert (a.seq_lo, a.seq_hi, a.n_missing) == (1, 5, 2)  # holes: 3,4
    b = rows["b"]
    assert (b.n_events, b.n_dups, b.n_missing) == (1, 0, 0)
    # approx mode keeps the schema and is exact at this cardinality
    approx = {
        r.src: r
        for r in sequence_gap_summary(df, by=["src"], exact=False).collect()
    }
    assert approx["a"].n_missing == 2


def test_gap_monitor_cross_batch(spark, tmp_path):
    state = str(tmp_path / "hwm.json")
    mon = GapMonitor(by=["src"], state_path=state)
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "src string, op_sequence long"
    )
    assert mon.check_batch(b1) == []  # first sight: baseline only
    # a jumps 2 -> 5 (3,4 lost in transport); b re-delivers 1
    b2 = spark.createDataFrame(
        [("a", 5), ("b", 1), ("b", 2)], "src string, op_sequence long"
    )
    got = {a["kind"]: a for a in mon.check_batch(b2)}
    assert got["gap"]["group"] == ("a",)
    assert (got["gap"]["gap_start"], got["gap"]["gap_end"]) == (3, 4)
    assert got["overlap"]["group"] == ("b",)
    # a restarted monitor resumes from persisted hwm: contiguous batch
    # is clean, a second hole is caught
    mon2 = GapMonitor(by=["src"], state_path=state)
    b3 = spark.createDataFrame([("a", 6)], "src string, op_sequence long")
    assert mon2.check_batch(b3) == []
    b4 = spark.createDataFrame([("a", 9)], "src string, op_sequence long")
    assert [a["kind"] for a in mon2.check_batch(b4)] == ["gap"]


def test_gap_monitor_strict_raises(spark):
    mon = GapMonitor(strict=True)
    mon.check_batch(spark.createDataFrame([(1,)], "op_sequence long"))
    with pytest.raises(RuntimeError, match="sequence gaps"):
        mon.check_batch(spark.createDataFrame([(4,)], "op_sequence long"))


def test_replay_job_gapmon_wiring(spark, smoke_log, tmp_path, monkeypatch, capsys):
    """REPLAY_GAPMON=strict replays a dense WAL (re-deliveries are
    reported, not fatal) and REFUSES a WAL with holes — missing change
    events mean a replica no amount of replaying can repair."""
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import replay_job

    monkeypatch.setenv("REPLAY_MODE", "pipelined")
    monkeypatch.setenv("REPLAY_N_BUCKETS", "8")
    monkeypatch.setenv("REPLAY_FILES_PER_BATCH", "8")
    monkeypatch.setenv("REPLAY_GAPMON", "strict")
    monkeypatch.setattr(
        sys, "argv", ["replay_job.py", smoke_log, str(tmp_path / "sink")]
    )
    replay_job.main()
    import json

    line = next(
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("GAPMON ")
    )
    s = json.loads(line[len("GAPMON "):])
    assert s["n_missing"] == 0 and s["n_dups"] > 0  # fixture re-delivers

    # punch a hole: rewrite one file without sequences 100..109
    holey = str(tmp_path / "holey_log")
    shutil.copytree(smoke_log, holey)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from collections import Counter

    parts = sorted(f for f in os.listdir(holey) if f.startswith("part-"))
    counts = Counter()
    for f in parts:
        counts.update(
            pq.read_table(
                os.path.join(holey, f), columns=["op_sequence"]
            ).column(0).to_pylist()
        )
    victim = parts[0]
    tb = pq.read_table(os.path.join(holey, victim))
    # only globally-unique sequences make a real hole (the fixture
    # re-delivers ~1.5% of events into other files)
    seqs = sorted(
        s for s in set(tb.column("op_sequence").to_pylist())
        if counts[s] == 1
    )[:10]
    assert seqs
    pq.write_table(
        tb.filter(
            pc.invert(pc.is_in(tb.column("op_sequence"), pa_values(seqs)))
        ),
        os.path.join(holey, victim),
    )
    monkeypatch.setattr(
        sys, "argv", ["replay_job.py", holey, str(tmp_path / "sink2")]
    )
    with pytest.raises(RuntimeError, match="missing sequence numbers"):
        replay_job.main()
    out2 = capsys.readouterr().out
    assert "GAPMON" in out2 and "first_gaps" in out2


def pa_values(seqs):
    import pyarrow as pa

    return pa.array(seqs, type=pa.int64())


def test_gap_monitor_overlap_keeps_hwm(spark):
    """Re-delivery must not LOWER the high-water mark — the next batch
    is judged against the furthest point ever seen."""
    mon = GapMonitor()
    mon.check_batch(spark.createDataFrame([(10,)], "op_sequence long"))
    mon.check_batch(spark.createDataFrame([(3,)], "op_sequence long"))
    got = mon.check_batch(spark.createDataFrame([(13,)], "op_sequence long"))
    assert [a["kind"] for a in got] == ["gap"]  # 11,12 missing vs hwm=10
