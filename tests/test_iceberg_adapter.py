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


def test_apply_batch_serializes_commits(monkeypatch):
    """ADVICE (round 2, high): pipelined replay calls apply_batch from
    several driver threads, but the wap snapshot-property conf and the
    MERGE source view are session-global JVM state. Two concurrent
    batches must (a) never run their MERGEs overlapped, (b) each see
    THEIR OWN batch id in the conf at MERGE time, and (c) each MERGE a
    view that exists and is uniquely named per batch."""
    import threading
    import time

    import beehive_data_etl_spark.sinks.iceberg as icb
    from pyspark.sql import types as T

    payload_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("op_sequence", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )

    class StubResult:
        def collect(self):
            return []

    class StubConf:
        def __init__(self):
            self.props = {}

        def set(self, k, v):
            self.props[k] = v

        def unset(self, k):
            self.props.pop(k, None)

    class StubCatalog:
        def __init__(self, views):
            self._views = views

        def dropTempView(self, name):
            self._views.pop(name, None)

    class StubSpark:
        def __init__(self):
            self.conf = StubConf()
            self.views = {}
            self.catalog = StubCatalog(self.views)
            self.merges = []
            self._in_merge = False
            self.overlapped = False
            self.checkpoints = 0

        def table(self, name):
            class Tbl:
                schema = payload_schema

            return Tbl()

        def sql(self, q):
            if "MERGE INTO" in q:
                if self._in_merge:
                    self.overlapped = True
                self._in_merge = True
                time.sleep(0.05)  # widen the race window
                import re as _re

                view = _re.search(r"USING (\S+)", q).group(1)
                self.merges.append(
                    (
                        view,
                        self.conf.props.get(f"spark.wap.snapshot-property.{icb.BATCH_PROP}"),
                        view in self.views,
                    )
                )
                self._in_merge = False
            return StubResult()

    class StubDF:
        def __init__(self, owner):
            self.owner = owner
            self.columns = ["doc_id", "op_sequence", "op"]

        def drop(self, *cols):
            return self

        def withColumn(self, *a, **k):
            return self

        def localCheckpoint(self, eager=False):
            # the fold must materialize per batch, before the critical
            # section (round-3 review: a lazy fold executes its job
            # under the lock, serializing all batch compute) — code
            # position guarantees the ordering; count the calls here
            self.owner.checkpoints += 1
            return self

        def select(self, *cols):
            class Sel:
                schema = T.StructType(
                    [
                        T.StructField("doc_id", T.StringType()),
                        T.StructField("op_sequence", T.LongType()),
                    ]
                )

            return Sel()

        def createOrReplaceTempView(self, name):
            self.owner.views[name] = True

    monkeypatch.setattr(icb, "lww_dedup", lambda df, *a, **k: df)
    monkeypatch.setattr(icb, "align_to_schema", lambda df, schema: df)

    sink = IcebergSink.__new__(IcebergSink)
    stub = StubSpark()
    sink.spark = stub
    sink.table = "cat.db.tokens"
    sink.salt_partials = 0
    sink._commit_lock = threading.Lock()

    threads = [
        threading.Thread(target=sink.apply_batch, args=(StubDF(stub), f"b{i}"))
        for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not stub.overlapped  # (a) MERGEs serialized
    assert len(stub.merges) == 4
    views = {v for v, _, _ in stub.merges}
    assert views == {f"__beehive_batch_b{i}" for i in range(4)}  # (c) unique
    for view, prop, existed in stub.merges:
        assert existed  # (c) view present at MERGE time
        assert prop == view.rsplit("_", 1)[-1]  # (b) own batch id stamped
    assert stub.views == {}  # views dropped after commit
    assert stub.conf.props == {}  # property unset after commit
    assert stub.checkpoints == 4  # every batch materialized pre-lock


def test_tag_and_rollback_sql_strings(spark):
    from beehive_data_etl_spark.sinks.iceberg import IcebergSink

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "lake.db.tokens"
    sink.n_buckets = 64
    assert (
        sink.tag_sql("audit_q2")
        == "ALTER TABLE lake.db.tokens CREATE TAG `audit_q2`"
    )
    assert "AS OF VERSION 42" in sink.tag_sql("audit_q2", 42)
    assert sink.drop_tag_sql("audit_q2") == "ALTER TABLE lake.db.tokens DROP TAG `audit_q2`"
    assert (
        sink.rollback_sql(99)
        == "CALL lake.system.rollback_to_snapshot('lake.db.tokens', 99)"
    )


def test_rollback_sql_requires_catalog_qualified_name(spark):
    import pytest

    from beehive_data_etl_spark.sinks.iceberg import IcebergSink

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "db.tokens"  # 2-part: session-catalog relative
    sink.n_buckets = 64
    with pytest.raises(ValueError, match="catalog-qualified"):
        sink.rollback_sql(7)
