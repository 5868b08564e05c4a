"""IcebergSink adapter (SURVEY.md §7.4 M9): the SQL mapping is
code-complete and cluster-only; here we verify the guard and that the
generated DDL/MERGE SQL encodes the proven protocol faithfully."""

import pytest

from beehive_data_etl_spark.sinks.iceberg import IcebergSink, iceberg_available


def test_unavailable_guard(spark):
    assert not iceberg_available(spark)  # no jars in this sandbox
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergSink(spark, "cat.db.tokens")


def test_sql_mapping_encodes_protocol(spark):
    sink = IcebergSink.__new__(IcebergSink)  # bypass the classpath guard
    sink.table = "cat.db.tokens"
    sink.n_buckets = 4096

    ddl = sink.create_table_ddl(
        "doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING"
    )
    assert "PARTITIONED BY (bucket(4096, doc_id))" in ddl  # A7 key partitioning
    assert "'write.merge.mode'='merge-on-read'" in ddl  # same MoR design
    assert "op_sequence BIGINT" in ddl and "deleted BOOLEAN" in ddl

    merge = sink.merge_sql()
    # the LWW cross-batch condition — stale events are no-ops (A3/A6)
    assert "s.op_sequence > t.op_sequence" in merge
    assert "WHEN NOT MATCHED THEN INSERT" in merge

    evolved = sink.evolve_ddl(["ADD COLUMN lang string", "ALTER COLUMN n_tok TYPE bigint"])
    assert evolved == [
        "ALTER TABLE cat.db.tokens ADD COLUMN lang string",
        "ALTER TABLE cat.db.tokens ALTER COLUMN n_tok TYPE bigint",
    ]
