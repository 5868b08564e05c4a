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
    sink.patch = False

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
    sink.patch = False
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


def test_purge_sql_strings(spark):
    import pytest

    from beehive_data_etl_spark.sinks.iceberg import IcebergSink

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "lake.db.tokens"
    sink.n_buckets = 64
    stmts = sink.purge_sql(["doc-1", "o'brien"])
    assert stmts[0] == (
        "DELETE FROM lake.db.tokens WHERE doc_id IN ('doc-1', 'o''brien')"
    )
    assert "lake.system.expire_snapshots" in stmts[1]
    assert "retain_last => 1" in stmts[1]
    assert "lake.system.remove_orphan_files" in stmts[2]
    with pytest.raises(ValueError, match="at least one key"):
        sink.purge_sql([])
    sink.table = "db.tokens"
    with pytest.raises(ValueError, match="catalog-qualified"):
        sink.purge_sql(["k"])


def test_rollback_sql_requires_catalog_qualified_name(spark):
    import pytest

    from beehive_data_etl_spark.sinks.iceberg import IcebergSink

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "db.tokens"  # 2-part: session-catalog relative
    sink.n_buckets = 64
    with pytest.raises(ValueError, match="catalog-qualified"):
        sink.rollback_sql(7)


def test_patch_sql_mapping(spark):
    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "cat.db.tokens"
    sink.n_buckets = 512
    sink.patch = True

    ddl = sink.create_table_ddl("doc_id STRING, tokens ARRAY<INT>, n_tok INT")
    assert "_cell_seq MAP<STRING, BIGINT>" in ddl

    with pytest.raises(ValueError, match="payload_cols"):
        sink.merge_sql("v")
    merge = sink.merge_sql("v", payload_cols=["tokens", "n_tok"])
    # a MATCHED row always updates; each cell decides behind its own arm
    assert "WHEN MATCHED THEN UPDATE SET" in merge
    assert "s._cell_seq['tokens'] > t._cell_seq['tokens']" in merge
    assert "s._cell_seq['deleted'] > t._cell_seq['deleted']" in merge
    assert "map_zip_with(t._cell_seq, s._cell_seq" in merge
    assert "GREATEST(t.op_sequence, s.op_sequence)" in merge
    assert "WHEN NOT MATCHED THEN INSERT *" in merge


def test_patch_merge_exprs_equal_engine_fold(spark):
    """The cluster MERGE's SET expressions, evaluated against plain
    DataFrames, must produce EXACTLY the state the engine fold
    produces — i.e. merge(fold(A), fold(B)) == fold(A ∪ B) under the
    generated SQL. Interleaved seqs make B carry late cells below A's
    row clocks (the case the row-seq guard cannot handle)."""
    from patch_model import PAYLOAD, SCHEMA, to_events

    import pandas as pd
    from pyspark.sql import functions as F

    from beehive_data_etl_spark.operators.patch import (
        CELL,
        cell_lww_dedup,
        patch_events,
    )

    ops = [
        ("I", 0, [], 1), ("P", 0, ["a"], 2), ("D", 1, [], 3),
        ("I", 1, [], 4), ("P", 1, ["b"], 5), ("U", 2, [], 6),
        ("P", 2, ["a", "c"], 7), ("I", 3, [], 8), ("P", 4, ["b"], 9),
        ("D", 0, [], 10), ("P", 3, ["c"], 11), ("I", 5, [], 12),
    ]
    events = to_events(ops)
    a_ev = [e for e in events if e["op_sequence"] % 2 == 1]
    b_ev = [e for e in events if e["op_sequence"] % 2 == 0]

    def fold(ev):
        df = spark.createDataFrame(pd.DataFrame(ev), schema=SCHEMA)
        return cell_lww_dedup(
            patch_events(df, key="doc_id", seq="op_sequence"),
            key="doc_id",
            seq="op_sequence",
        )

    t, s = fold(a_ev), fold(b_ev)
    exprs = IcebergSink.patch_update_exprs(PAYLOAD)
    j = t.alias("t").join(
        s.alias("s"), F.col("t.doc_id") == F.col("s.doc_id"), "full_outer"
    )
    out_cols = ["doc_id"] + list(exprs)
    sim = j.selectExpr(
        "coalesce(t.doc_id, s.doc_id) AS doc_id",
        *[
            # NOT MATCHED → INSERT * (take s); t-only → keep t;
            # matched → the MERGE's SET expression verbatim
            f"CASE WHEN t.doc_id IS NULL THEN s.{c} "
            f"WHEN s.doc_id IS NULL THEN t.{c} "
            f"ELSE {e} END AS {c}"
            for c, e in exprs.items()
        ],
    )
    want = fold(events).select(*out_cols)

    def rows(df):
        out = {}
        for r in df.collect():
            d = r.asDict()
            d[CELL] = dict(d[CELL] or {})
            out[d.pop("doc_id")] = d
        return out

    assert rows(sim) == rows(want)


def test_alter_column_sql_strings(spark):
    """drop_column/rename_column cluster twins: metadata-only by field
    id — the reason the filesystem sink must rewrite physically."""
    from beehive_data_etl_spark.sinks.iceberg import IcebergSink

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "lake.db.tokens"
    assert (
        sink.drop_column_sql("source")
        == "ALTER TABLE lake.db.tokens DROP COLUMN `source`"
    )
    assert (
        sink.rename_column_sql("source", "provenance")
        == "ALTER TABLE lake.db.tokens RENAME COLUMN `source` TO `provenance`"
    )


def _interpret_alter(state, ddl_stmts):
    """Execute the adapter's generated ALTER TABLE statements against a
    plain DataFrame standing in for the Iceberg table — the point is
    that the DDL TEXT itself (not some parallel code path) drives the
    simulated evolution, so a wrong generated statement fails here
    instead of on the first real cluster run."""
    import re as _re

    from pyspark.sql import functions as F

    for stmt in ddl_stmts:
        m = _re.fullmatch(
            r"ALTER TABLE \S+ ADD COLUMN (\w+) (\S+)", stmt
        )
        if m:
            state = state.withColumn(m.group(1), F.lit(None).cast(m.group(2)))
            continue
        m = _re.fullmatch(
            r"ALTER TABLE \S+ ALTER COLUMN (\w+) TYPE (\S+)", stmt
        )
        if m:
            state = state.withColumn(m.group(1), F.col(m.group(1)).cast(m.group(2)))
            continue
        raise AssertionError(f"unrecognized generated DDL: {stmt}")
    return state


def test_row_merge_with_mid_merge_evolution_equals_snapshot_sink(spark, tmp_path):
    """VERDICT r04 item 4: the adapter's EVOLUTION path — a batch that
    adds `lang` and widens `n_tok` mid-stream — simulated end-to-end
    with the adapter's own building blocks: evolve_schema's generated
    ALTER statements are INTERPRETED against the simulated table,
    align_to_schema projects each batch, and the generated merge_sql's
    MATCHED guard (extracted from the SQL text, not re-derived) drives
    a full-outer-join simulation of MERGE. Final state must equal the
    SnapshotSink twin replaying the identical batches."""
    import re as _re

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from beehive_data_etl_spark.operators.lww import lww_dedup
    from beehive_data_etl_spark.operators.schema_evolution import (
        align_to_schema,
        evolve_schema,
    )
    from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "cat.db.tokens"
    sink.n_buckets = 8
    sink.patch = False

    base = (
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok int, source string"
    )
    evolved = (
        "op string, op_sequence long, doc_id string, tokens array<int>, "
        "n_tok long, source string, lang string"
    )
    b1 = spark.createDataFrame(
        [
            ("I", 1, "d1", [1, 2], 2, "a"),
            ("I", 2, "d2", [3], 1, "a"),
            ("I", 3, "d3", [4, 5, 6], 3, "b"),
            ("U", 4, "d1", [9], 1, "a"),
        ],
        base,
    )
    b2 = spark.createDataFrame(
        [
            ("U", 6, "d2", [7, 7], 2**31 + 10, "a", "en"),  # needs the widen
            ("D", 7, "d3", None, None, None, None),
            ("I", 8, "d4", [8], 1, "c", "fr"),
            ("U", 5, "d1", [0], 1, "a", "de"),  # stale vs nothing (wins: 5>4)
        ],
        evolved,
    )

    # ---- simulated Iceberg table ----
    table_schema = T.StructType.fromDDL(
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op_sequence long, deleted boolean"
    )
    state = spark.createDataFrame([], table_schema)
    guard = None
    for i, batch in enumerate((b1, b2)):
        src = (
            lww_dedup(batch, "doc_id", "op_sequence")
            .withColumn("deleted", F.col("op") == F.lit("D"))
            .drop("op")
        )
        payload_schema = batch.drop("op", "op_sequence").schema
        tbl_payload = T.StructType(
            [f for f in state.schema.fields if f.name not in ("op_sequence", "deleted")]
        )
        _, ddl_log = evolve_schema(tbl_payload, payload_schema)
        if i == 0:
            assert ddl_log == []
        else:
            assert ddl_log == [
                "ALTER COLUMN n_tok TYPE bigint",
                "ADD COLUMN lang string",
            ]
        state = _interpret_alter(state, sink.evolve_ddl(ddl_log))
        aligned = align_to_schema(src, state.schema)
        merge = sink.merge_sql("v")
        guard = _re.search(
            r"WHEN MATCHED AND (.+?) THEN UPDATE SET \*", merge
        ).group(1)
        cols = [f.name for f in state.schema.fields]
        j = state.alias("t").join(
            aligned.alias("s"), F.col("t.doc_id") == F.col("s.doc_id"), "full_outer"
        )
        state = j.selectExpr(
            *[
                f"CASE WHEN t.doc_id IS NULL THEN s.{c} "
                f"WHEN s.doc_id IS NULL THEN t.{c} "
                f"WHEN {guard} THEN s.{c} ELSE t.{c} END AS {c}"
                for c in cols
            ]
        ).localCheckpoint()
    assert guard == "s.op_sequence > t.op_sequence"

    # ---- SnapshotSink twin on the identical batches ----
    root = str(tmp_path / "sink")
    twin = SnapshotSink(spark, root, n_buckets=4)
    twin.apply_batch(b1, "b1")
    twin.apply_batch(b2, "b2")
    want = twin.read_state()

    def rows(df, cols):
        out = {}
        for r in df.select(*cols).collect():
            d = r.asDict()
            d["tokens"] = tuple(d["tokens"] or ()) if d["tokens"] is not None else None
            out[d.pop("doc_id")] = d
        return out

    cols = ["doc_id", "tokens", "n_tok", "source", "lang", "op_sequence", "deleted"]
    assert rows(state, cols) == rows(want, cols)
    # the widen actually landed (2**31+10 survives as bigint)
    assert state.filter(F.col("n_tok") > 2**31).count() == 1


def test_rollback_tag_sequencing_and_committed_ancestry(spark):
    """VERDICT r04 item 4 (rollback/tag sequencing): committed() must
    consult ONLY the current ancestry, so after rollback_sql a batch
    stamped solely in a rolled-back snapshot reads as NOT committed
    (re-appliable) while pre-rollback ancestors stay committed. The
    stub models Iceberg's snapshots/history semantics — snapshots keep
    parent links, `is_current_ancestor` walks from the head the
    rollback CALL moved — and answers the adapter's ACTUAL SQL text."""
    import re as _re

    class Row:
        def __init__(self, b):
            self.b = b

    class StubSpark:
        def __init__(self):
            # snapshot_id -> (parent_id, batch_id)
            self.snapshots = {1: (None, "b1"), 2: (1, "b2"), 3: (2, "b3")}
            self.head = 3
            self.queries = []

        def _ancestors(self):
            sid, out = self.head, []
            while sid is not None:
                out.append(sid)
                sid = self.snapshots[sid][0]
            return out

        def sql(self, q):
            self.queries.append(q)
            if "rollback_to_snapshot" in q:
                sid = int(_re.search(r",\s*(\d+)\)", q).group(1))
                self.head = sid

                class Empty:
                    def collect(self):
                        return []

                return Empty()
            assert "is_current_ancestor" in q, q  # the load-bearing filter
            assert ".snapshots" in q and ".history" in q
            anc = self._ancestors()
            rows = [Row(self.snapshots[s][1]) for s in anc]

            class Res:
                def collect(self):
                    return rows

            return Res()

    sink = IcebergSink.__new__(IcebergSink)
    sink.table = "lake.db.tokens"
    sink.n_buckets = 8
    stub = StubSpark()
    sink.spark = stub

    assert sink.committed("b2") and sink.committed("b3")
    # runbook sequencing: pin the pre-rollback state with a tag FIRST
    # (tags survive expire_snapshots), then roll back, then clean up
    stmts = [sink.tag_sql("pre_rollback", 3), sink.rollback_sql(1)]
    assert stmts[0] == (
        "ALTER TABLE lake.db.tokens CREATE TAG `pre_rollback` AS OF VERSION 3"
    )
    assert stmts[1] == (
        "CALL lake.system.rollback_to_snapshot('lake.db.tokens', 1)"
    )
    stub.sql(stmts[1])  # execute the rollback against the model
    assert stub.head == 1
    # b2/b3 stamped only in rolled-back snapshots: re-appliable now
    assert not sink.committed("b2")
    assert not sink.committed("b3")
    assert sink.committed("b1")  # still an ancestor
    assert (
        sink.drop_tag_sql("pre_rollback")
        == "ALTER TABLE lake.db.tokens DROP TAG `pre_rollback`"
    )
