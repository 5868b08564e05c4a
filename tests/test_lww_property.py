"""Property-based LWW semantics (SURVEY.md §5.6, FIXTURES.md F6):
random op sequences — interleaved I/U/D, duplicate deliveries,
out-of-order arrival, delete/reinsert — replayed through the engine's
batch merge must equal a fold-left LWW model in plain Python."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from beehive_data_etl_spark.operators.lww import lww_dedup
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink


def _ops_strategy():
    op_entry = st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=9),  # doc index
        st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=8),
    )
    return st.lists(op_entry, min_size=1, max_size=60)


def _fold_left_model(events: list[dict]) -> dict[str, dict]:
    """Plain-Python LWW: max op_sequence wins per key; 'D' tombstones."""
    state: dict[str, dict] = {}
    for e in sorted(events, key=lambda e: e["op_sequence"]):
        state[e["doc_id"]] = e
    return {k: v for k, v in state.items() if v["op"] != "D"}


def _to_events(ops, shuffle_seed: int) -> list[dict]:
    events = []
    for seq, (op, doc, toks) in enumerate(ops, start=1):
        events.append(
            {
                "op": op,
                "op_sequence": seq,
                "doc_id": f"doc-{doc:08d}",
                "tokens": None if op == "D" else [int(t) for t in toks],
                "n_tok": None if op == "D" else len(toks),
                "source": "prop",
            }
        )
    # duplicate ~1 in 5 events verbatim and shuffle arrival order
    dups = [dict(e) for e in events[:: 5]]
    import random

    rng = random.Random(shuffle_seed)
    arrived = events + dups
    rng.shuffle(arrived)
    return arrived


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_strategy(), shuffle_seed=st.integers(0, 2**16))
def test_engine_matches_fold_left_model(spark, tmp_path_factory, ops, shuffle_seed):
    arrived = _to_events(ops, shuffle_seed)
    model = _fold_left_model(arrived)

    pdf = pd.DataFrame(arrived)
    schema = (
        "op string, op_sequence long, doc_id string, "
        "tokens array<int>, n_tok int, source string"
    )
    root = str(tmp_path_factory.mktemp("prop_sink"))
    sink = SnapshotSink(spark, root, n_buckets=4, lineage=False)
    # split the arrival stream into two micro-batches to exercise the
    # cross-batch merge condition as well as the in-batch reduction
    half = max(1, len(pdf) // 2)
    sink.apply_batch(spark.createDataFrame(pdf.iloc[:half], schema=schema), "b0")
    if half < len(pdf):
        sink.apply_batch(spark.createDataFrame(pdf.iloc[half:], schema=schema), "b1")
    got = {
        r["doc_id"]: r.asDict()
        for r in sink.read_final().collect()
    }
    assert set(got) == set(model)
    for k, m in model.items():
        assert got[k]["tokens"] == m["tokens"], k
        assert got[k]["n_tok"] == m["n_tok"], k


def test_lww_dedup_salted_equals_unsalted(spark, skew_log):
    df = spark.read.parquet(skew_log)
    plain = lww_dedup(df, "doc_id", "op_sequence").orderBy("doc_id")
    salted = lww_dedup(df, "doc_id", "op_sequence", salt_partials=8).orderBy("doc_id")
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=_ops_strategy(),
    shuffle_seed=st.integers(0, 2**16),
    n_batches=st.integers(2, 4),
)
def test_pipelined_replay_matches_fold_left_model(
    spark, tmp_path_factory, ops, shuffle_seed, n_batches
):
    """The same fold-left model must hold when the batches are applied
    CONCURRENTLY (pipelined replay): commit order is arbitrary, so this
    exercises the order-insensitivity claim the pipelining rests on."""
    from concurrent.futures import ThreadPoolExecutor

    arrived = _to_events(ops, shuffle_seed)
    model = _fold_left_model(arrived)

    pdf = pd.DataFrame(arrived)
    schema = (
        "op string, op_sequence long, doc_id string, "
        "tokens array<int>, n_tok int, source string"
    )
    root = str(tmp_path_factory.mktemp("prop_pipe_sink"))
    sink = SnapshotSink(spark, root, n_buckets=4, lineage=False, compact_threshold=2)
    size = max(1, len(pdf) // n_batches)
    chunks = [pdf.iloc[i : i + size] for i in range(0, len(pdf), size)]
    with ThreadPoolExecutor(max_workers=len(chunks)) as ex:
        list(
            ex.map(
                lambda ic: sink.apply_batch(
                    spark.createDataFrame(ic[1], schema=schema), f"pb{ic[0]}"
                ),
                enumerate(chunks),
            )
        )
    got = {
        r["doc_id"]: r.asDict()
        for r in sink.read_state().filter("NOT deleted").collect()
    }
    assert set(got) == set(model)
    for k, m in model.items():
        assert got[k]["tokens"] == m["tokens"], k
        assert got[k]["op_sequence"] == m["op_sequence"], k
