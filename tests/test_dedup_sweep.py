"""Corpus dedup sweep (operators/dedup_sweep.py): candidate pairs →
verify against LIVE content → connected components → keep one canonical
doc per cluster → tombstone losers as ONE exactly-once change batch."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from beehive_data_etl_spark.functions.incremental_dedup import NearDupView
from beehive_data_etl_spark.operators.dedup_sweep import (
    dedup_sweep,
    verified_pairs,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

SCHEMA = (
    "op string, op_sequence long, doc_id string, tokens array<int>, "
    "n_tok int, source string, event_ts timestamp, batch_hint int"
)
BASE = list(range(1, 30))  # long shared run -> near-dup signatures


def _ev(op, seq, doc, toks):
    n = len(toks) if toks is not None else None
    return (op, seq, doc, toks, n, "s", None, 0)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_new string, id_corpus string")


@pytest.fixture()
def sink(spark, tmp_path):
    return SnapshotSink(spark, str(tmp_path / "sink"), n_buckets=4)


def _live_keys(sink):
    return {r.doc_id for r in sink.read_final(columns=["doc_id"]).collect()}


def test_sweep_end_to_end_via_view(spark, sink, tmp_path):
    """The full loop: ingest near-dups, NearDupView finds the pair,
    the sweep keeps the min doc_id and tombstones the loser through
    the exactly-once sink; a re-run finds nothing left to do."""
    view = NearDupView(spark, sink, str(tmp_path / "nd"))
    sink.apply_batch(
        spark.createDataFrame(
            [
                _ev("I", 1, "a", BASE),
                _ev("I", 2, "b", list(range(500, 520))),
            ],
            SCHEMA,
        ),
        "b1",
    )
    view.refresh()
    sink.apply_batch(
        spark.createDataFrame([_ev("I", 3, "c", BASE + [99])], SCHEMA), "b2"
    )
    view.refresh()
    res = dedup_sweep(sink, view.pairs())
    assert res["clusters"] == 1 and res["losers"] == 1
    assert _live_keys(sink) == {"a", "b"}
    # the loser is a TRUTHFUL tombstone at the sweep's op_sequence —
    # changelog consumers (views/replicas/outbox) see an ordinary D
    dead = sink.read_state().filter("deleted and doc_id = 'c'").collect()
    assert len(dead) == 1 and dead[0].op_sequence == res["op_sequence"]
    # idempotence by minimality: the loser is dead, its edges drop
    res2 = dedup_sweep(sink, view.pairs())
    assert res2["losers"] == 0
    assert _live_keys(sink) == {"a", "b"}


def test_stale_pair_not_deleted_after_update(spark, sink, tmp_path):
    """The pair store is append-only history: a doc UPDATED since the
    pair was recorded no longer resembles its partner, and the sweep's
    content re-verification must spare it."""
    view = NearDupView(spark, sink, str(tmp_path / "nd"))
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 1, "a", BASE), _ev("I", 2, "c", BASE + [99])], SCHEMA
        ),
        "b1",
    )
    view.refresh()
    assert view.pairs().count() == 1  # the (a, c) candidate is recorded
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("U", 3, "c", list(range(800, 840)))], SCHEMA
        ),
        "b2",
    )
    view.refresh()
    res = dedup_sweep(sink, view.pairs())
    assert res["losers"] == 0
    assert _live_keys(sink) == {"a", "c"}


def test_dead_endpoint_drops_its_edges(spark, sink):
    """A user-deleted doc must never anchor a cluster: with the min-id
    member dead, the sweep keeps the smallest LIVE member — and a
    cluster connected only THROUGH the dead doc splits (conservative:
    a~c was never verified directly)."""
    sink.apply_batch(
        spark.createDataFrame(
            [
                _ev("I", 1, "a", BASE),
                _ev("I", 2, "b", BASE + [99]),
                _ev("I", 3, "c", BASE + [98]),
                _ev("D", 4, "a", None),
            ],
            SCHEMA,
        ),
        "b1",
    )
    pairs = _pairs(
        spark, [("a", "b"), ("a", "c"), ("b", "c")]
    )  # explicit edges: the test is about liveness, not LSH recall
    res = dedup_sweep(sink, pairs)
    assert res["losers"] == 1
    assert _live_keys(sink) == {"b"}
    # now the split case: only edges through the dead doc
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 5, "x", BASE), _ev("I", 6, "y", BASE + [97])], SCHEMA
        ),
        "b2",
    )
    res2 = dedup_sweep(sink, _pairs(spark, [("a", "x"), ("a", "y")]))
    assert res2["losers"] == 0  # x–y never verified directly
    assert {"x", "y"} <= _live_keys(sink)


def test_prefer_column_keeps_best_with_min_key_tiebreak(spark, sink):
    """prefer=("n_tok", "max") keeps the LONGEST doc; equal lengths
    fall back to the minimum key so the winner stays deterministic."""
    sink.apply_batch(
        spark.createDataFrame(
            [
                _ev("I", 1, "a", BASE),            # 29 tokens
                _ev("I", 2, "b", BASE + [99, 98]), # 31 tokens — longest
                _ev("I", 3, "c", BASE + [99]),     # 30 tokens
            ],
            SCHEMA,
        ),
        "b1",
    )
    pairs = _pairs(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    res = dedup_sweep(sink, pairs, prefer=("n_tok", "max"))
    assert res["losers"] == 2
    assert _live_keys(sink) == {"b"}
    # tie-break: two equal-length dups -> min key survives
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 4, "q", BASE), _ev("I", 5, "p", BASE)], SCHEMA
        ),
        "b2",
    )
    res2 = dedup_sweep(
        sink, _pairs(spark, [("q", "p")]), prefer=("n_tok", "max")
    )
    assert res2["losers"] == 1
    live = _live_keys(sink)
    assert "p" in live and "q" not in live


def test_dry_run_threshold_and_refusals(spark, sink):
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 1, "a", BASE), _ev("I", 2, "c", BASE + [99])], SCHEMA
        ),
        "b1",
    )
    pairs = _pairs(spark, [("a", "c")])
    v0 = sink.current_snapshot()["version"]
    res = dedup_sweep(sink, pairs, dry_run=True)
    assert res["dry_run"] and res["losers"] == 1
    assert sink.current_snapshot()["version"] == v0  # nothing applied
    # threshold 1.0: the near-copy is NOT an exact dup
    assert dedup_sweep(sink, pairs, threshold=1.0)["losers"] == 0
    # verified_pairs exposes the jaccard for tuning
    vp = verified_pairs(sink, pairs, threshold=0.5).collect()
    assert len(vp) == 1 and 0.9 < vp[0].jaccard < 1.0
    with pytest.raises(ValueError, match="threshold"):
        dedup_sweep(sink, pairs, threshold=0.0)
    with pytest.raises(ValueError, match="direction"):
        dedup_sweep(sink, pairs, prefer=("n_tok", "best"))
    # empty pair set is a clean no-op
    assert dedup_sweep(sink, _pairs(spark, []))["losers"] == 0


def test_reused_batch_id_reports_skip(spark, sink):
    """The sink's exactly-once dedup is honest at the sweep level: a
    crash-retry (same id) skips and says so instead of claiming a
    fresh delete (delete_where's contract)."""
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 1, "a", BASE), _ev("I", 2, "c", BASE + [99])], SCHEMA
        ),
        "b1",
    )
    res = dedup_sweep(sink, _pairs(spark, [("a", "c")]))
    assert res["losers"] == 1 and not res.get("skipped")
    # new dup appears; reusing the OLD sweep's id must not silently
    # pretend the new loser was deleted
    sink.apply_batch(
        spark.createDataFrame([_ev("I", 3, "e", BASE + [97])], SCHEMA), "b2"
    )
    res2 = dedup_sweep(
        sink, _pairs(spark, [("a", "e")]), batch_id=res["batch_id"]
    )
    assert res2.get("skipped") and res2["losers"] == 0
    assert "e" in _live_keys(sink)
    # the default (version, seq) id does apply it
    res3 = dedup_sweep(sink, _pairs(spark, [("a", "e")]))
    assert res3["losers"] == 1 and "e" not in _live_keys(sink)


def test_empty_tokens_are_mutual_dups(spark, sink):
    """Two docs with no shingles at all (empty arrays) are trivially
    identical — jaccard 1.0, not a divide-by-zero NULL."""
    sink.apply_batch(
        spark.createDataFrame(
            [_ev("I", 1, "e1", []), _ev("I", 2, "e2", [])], SCHEMA
        ),
        "b1",
    )
    res = dedup_sweep(sink, _pairs(spark, [("e1", "e2")]))
    assert res["losers"] == 1
    assert _live_keys(sink) == {"e1"}


def test_maintain_job_dedup_section(spark, sink, tmp_path, monkeypatch, capsys):
    """The cron path: MAINTAIN_SECTIONS=dedup refreshes (bootstrapping
    the view) and sweeps in one schedulable pass."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import maintain_job

    sink.apply_batch(
        spark.createDataFrame(
            [
                _ev("I", 1, "a", BASE),
                _ev("I", 2, "c", BASE + [99]),
                _ev("I", 3, "b", list(range(500, 520))),
            ],
            SCHEMA,
        ),
        "b1",
    )
    monkeypatch.setattr(sys, "argv", ["maintain_job.py", sink.root])
    monkeypatch.setenv("MAINTAIN_SECTIONS", "dedup,compact")
    maintain_job.main()
    line = next(
        ln
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("MAINTAIN_METRICS ")
    )
    metrics = json.loads(line.split(" ", 1)[1])
    assert metrics["dedup"]["losers"] == 1
    assert _live_keys(SnapshotSink(spark, sink.root, n_buckets=4)) == {
        "a",
        "b",
    }


def test_bucket_pairs_canonical_by_construction(spark):
    """Round 5: sweep_decisions_lsh feeds bucket_pairs output straight
    into verification WITHOUT _canonical_edges (one distinct-shuffle
    saved) — valid only while bucket_pairs guarantees a<b ordering and
    distinctness by construction. Pin that contract, including across
    buckets (the same pair surfacing in several band buckets must
    still collapse to one row)."""
    from pyspark.sql import functions as F

    from beehive_data_etl_spark.functions.dedup import bucket_pairs

    banded = spark.createDataFrame(
        [
            # bucket (0, 'x'): ids out of order, with a duplicate id
            (0, "x", "d3"), (0, "x", "d1"), (0, "x", "d2"), (0, "x", "d1"),
            # same pair (d1,d3) again in another bucket
            (1, "y", "d3"), (1, "y", "d1"),
        ],
        "band int, band_hash string, id string",
    )
    rows = bucket_pairs(banded, max_bucket=10).collect()
    pairs = {(r.id_a, r.id_b): r.n_shared_bands for r in rows}
    assert all(a < b for a, b in pairs), pairs
    assert len(pairs) == len(set(pairs)), "distinct by construction"
    # shared-band count: 2 from bucket x (the duplicated d1 pairs with
    # d3 twice — real banded input has one row per (id, band) so this
    # only arises in adversarial input and over- rather than
    # under-counts) + 1 from bucket y. The canonicity contract the
    # sweep relies on is the ROW properties above, not this count.
    assert pairs[("d1", "d3")] == 3
    assert set(pairs) == {("d1", "d2"), ("d1", "d3"), ("d2", "d3")}


def test_sweep_lsh_variant_paths_agree(spark):
    """The opt-out/variant knobs must not change results: the
    broadcast_small=False path (adversarial duplicate subgraphs too
    big to broadcast) and the cc="simple" path must produce exactly
    the decisions of the default broadcast+star path."""
    from pyspark.sql import functions as F

    from beehive_data_etl_spark.functions.dedup import word_shingles
    from beehive_data_etl_spark.operators.dedup_sweep import (
        sweep_decisions_lsh,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run(**kw):
        return {
            r.doc_id: (r.cluster_id, r.action)
            for r in sweep_decisions_lsh(
                docs, word_shingles("text", 3), k=16, bands=8,
                threshold=0.8, **kw
            ).collect()
        }

    base = run()
    assert len(base) == docs.count()
    assert any(v[1] == "D" for v in base.values())  # non-vacuous
    assert run(broadcast_small=False) == base
    assert run(cc="simple") == base
    assert run(broadcast_small=False, cc="simple") == base
