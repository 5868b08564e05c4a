"""IcebergSink — the cluster adapter for the proven sink protocol
(SURVEY.md §7.4 M9).

Maps the same interface the engine drives against ``SnapshotSink`` onto
Iceberg SQL. Everything subtle (exactly-once manifests, LWW merge
condition, schema-evolution rule, salting) is engine-side and already
fault-injection-tested against the snapshot sink; this adapter is a
thin SQL mapping:

- MERGE:        ``MERGE INTO … ON t.doc_id = s.doc_id
                 WHEN MATCHED AND s.op_sequence > t.op_sequence …``
- evolution:    ``ALTER TABLE … ADD COLUMN / ALTER COLUMN … TYPE``
                (the exact DDL strings ``evolve_schema`` emits)
- exactly-once: batch-id stamped into the snapshot summary via
                ``snapshot-property.`` write options; re-delivery is
                detected from the table's snapshot history.

Requires iceberg-spark-runtime on the classpath and a configured
catalog — neither exists in this sandbox, so the adapter import-guards
and every method raises a clear error when Iceberg isn't available.
The SQL below is exercised only as string construction in unit tests
here; on a cluster it runs verbatim.
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beehive_data_etl_spark.operators.lww import lww_dedup
from beehive_data_etl_spark.operators.schema_evolution import (
    align_to_schema,
    evolve_schema,
)

BATCH_PROP = "beehive.batch-id"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j attribute chains resolve lazily — forName is the real probe
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


class IcebergSink:
    """Same contract as SnapshotSink.apply_batch, over an Iceberg table.

    Bucketing comes from the table's own partition spec
    (``bucket(n, doc_id)``) — storage-partitioned joins co-locate the
    MERGE without an extra shuffle on clusters with SPJ enabled.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        n_buckets: int = 4096,
        salt_partials: int = 0,
        patch: bool = False,
    ) -> None:
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets
        self.salt_partials = salt_partials
        # per-cell LWW mode (operators.patch), mirroring
        # SnapshotSink(patch=True): the table carries a _cell_seq map
        # and the MERGE updates each column behind its own cell-seq
        # CASE arm (semantics proven equivalent to the engine fold by
        # test_iceberg_adapter's simulation test)
        self.patch = patch
        # pipelined replay (replay_incremental inflight>1) calls
        # apply_batch from several driver threads; the session-global
        # spark.wap.snapshot-property conf and the MERGE's source view
        # are shared JVM state, so commits must serialize — without
        # this, one batch's MERGE can consume another batch's view and
        # stamp the wrong batch id (silent event loss + corrupted
        # exactly-once bookkeeping). The expensive per-batch LWW fold
        # is MATERIALIZED before the lock (see apply_batch), so only
        # the view-create + conf-stamp + MERGE commit section is
        # serial — which on a real cluster is also what Iceberg's
        # optimistic snapshot commit protocol enforces at the table
        # level.
        self._commit_lock = threading.Lock()
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime not on the classpath; use "
                "sinks.snapshot.SnapshotSink in this environment"
            )

    # ---------------------------------------------------------------- DDL
    def create_table_ddl(self, payload_ddl: str) -> str:
        cell = ", _cell_seq MAP<STRING, BIGINT>" if self.patch else ""
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table} ("
            f"{payload_ddl}, op_sequence BIGINT, deleted BOOLEAN{cell}) "
            f"USING iceberg PARTITIONED BY (bucket({self.n_buckets}, doc_id)) "
            "TBLPROPERTIES ('write.merge.mode'='merge-on-read', "
            "'write.distribution-mode'='hash', 'format-version'='2')"
        )

    def evolve_ddl(self, ddl_log: list[str]) -> list[str]:
        return [f"ALTER TABLE {self.table} {stmt}" for stmt in ddl_log]

    def tag_sql(self, name: str, snapshot_id: int | None = None) -> str:
        """SnapshotSink.tag()'s cluster twin: an Iceberg tag retains the
        snapshot's files through expire_snapshots — the same vacuum-
        survival contract the filesystem sink implements."""
        at = f" AS OF VERSION {snapshot_id}" if snapshot_id is not None else ""
        return f"ALTER TABLE {self.table} CREATE TAG `{name}`{at}"

    def drop_tag_sql(self, name: str) -> str:
        return f"ALTER TABLE {self.table} DROP TAG `{name}`"

    def drop_column_sql(self, name: str) -> str:
        """SnapshotSink.drop_column()'s cluster twin. Iceberg drops by
        FIELD ID, metadata-only: old data files keep the bytes but the
        field id is retired, so re-adding the same NAME mints a new id
        and can never resurrect old values — which is exactly why the
        filesystem sink (name-based parquet) must rewrite physically
        instead.

        REFUSED on patch tables: their ``_cell_seq`` maps key cells BY
        NAME, and a metadata-only alter does not migrate map keys —
        the table would need an UPDATE rewriting every map first."""
        if getattr(self, "patch", False):
            raise RuntimeError(
                "metadata-only DROP COLUMN does not migrate the "
                "name-keyed _cell_seq maps of a patch table; run an "
                "UPDATE rewriting the maps first (or rebuild the table)"
            )
        return f"ALTER TABLE {self.table} DROP COLUMN `{name}`"

    def rename_column_sql(self, old: str, new: str) -> str:
        """SnapshotSink.rename_column()'s cluster twin — metadata-only
        for the same field-id reason (and patch-table refusal) as
        drop_column_sql."""
        if getattr(self, "patch", False):
            raise RuntimeError(
                "metadata-only RENAME COLUMN does not migrate the "
                "name-keyed _cell_seq maps of a patch table; run an "
                "UPDATE rewriting the maps first (or rebuild the table)"
            )
        return f"ALTER TABLE {self.table} RENAME COLUMN `{old}` TO `{new}`"

    def rollback_sql(self, snapshot_id: int) -> str:
        """SnapshotSink.rollback_to()'s cluster twin. Iceberg's
        procedure restores the old snapshot as the new current one;
        the engine-side consequence is identical — batch ids stamped in
        rolled-back snapshot summaries stop being the CURRENT history's
        ancestors, so ``committed()`` (which must then scan only the
        current ancestry, see note) reports them re-appliable."""
        parts = self.table.split(".")
        if len(parts) < 3:
            # a 2-part identifier resolves under the SESSION catalog,
            # whose name this adapter cannot know — emitting
            # "CALL <db>.system…" would target a nonexistent catalog
            raise ValueError(
                "rollback_sql needs a catalog-qualified table name "
                f"(catalog.db.table), got {self.table!r}"
            )
        return (
            f"CALL {parts[0]}.system.rollback_to_snapshot"
            f"('{self.table}', {snapshot_id})"
        )

    def purge_sql(self, keys: list[str]) -> list[str]:
        """SnapshotSink.purge_keys()'s cluster twin (takedown / right
        to be forgotten): a row-level DELETE removes the keys' rows
        AND tombstones from current state, then expire_snapshots +
        remove_orphan_files destroy every retained byte — history,
        time travel, orphans. The DELETE is not an engine tombstone:
        after it, a legitimate re-insert at ANY op_sequence wins,
        matching the filesystem sink's clock-restart semantics. As
        there, tags pin bytes past expiry — drop them first — and
        every replica must run the same purge (no forward delete event
        exists at a truthful op_sequence for replication to carry)."""
        if not keys:
            raise ValueError("purge_sql() needs at least one key")
        parts = self.table.split(".")
        if len(parts) < 3:
            raise ValueError(
                "purge_sql needs a catalog-qualified table name "
                f"(catalog.db.table), got {self.table!r}"
            )
        in_list = ", ".join("'" + k.replace("'", "''") + "'" for k in keys)
        return [
            f"DELETE FROM {self.table} WHERE doc_id IN ({in_list})",
            # retain_last 1 + older_than now: only the post-delete
            # snapshot survives, so the deleted rows' data/delete files
            # become unreferenced and are physically removed
            f"CALL {parts[0]}.system.expire_snapshots"
            f"(table => '{self.table}', older_than => now(), "
            "retain_last => 1)",
            f"CALL {parts[0]}.system.remove_orphan_files"
            f"(table => '{self.table}')",
        ]

    @staticmethod
    def patch_update_exprs(payload_cols: list[str]) -> dict[str, str]:
        """Per-cell MERGE SET expressions (patch mode): each column
        updates only when the SOURCE cell's setter seq beats the
        target's, and the cell-seq maps merge by per-key max
        (``map_zip_with``; -1 stands in for an absent side and never
        surfaces — at least one side is set for every merged key).
        These exact strings are both embedded in ``merge_sql`` and
        evaluated against plain DataFrames in the adapter test, which
        proves them row-for-row equivalent to ``cell_lww_dedup``."""

        def arm(c: str) -> str:
            return (
                f"CASE WHEN s._cell_seq['{c}'] IS NOT NULL AND "
                f"(t._cell_seq['{c}'] IS NULL OR "
                f"s._cell_seq['{c}'] > t._cell_seq['{c}']) "
                f"THEN s.{c} ELSE t.{c} END"
            )

        exprs = {c: arm(c) for c in payload_cols}
        exprs["deleted"] = arm("deleted")
        exprs["op_sequence"] = "GREATEST(t.op_sequence, s.op_sequence)"
        exprs["_cell_seq"] = (
            "map_zip_with(t._cell_seq, s._cell_seq, (k, tv, sv) -> "
            "GREATEST(COALESCE(tv, CAST(-1 AS BIGINT)), "
            "COALESCE(sv, CAST(-1 AS BIGINT))))"
        )
        return exprs

    def merge_sql(
        self, view: str = "__beehive_batch", payload_cols: list[str] | None = None
    ) -> str:
        """The LWW MERGE — identical semantics to the snapshot sink's
        single LWW aggregation: newer op_sequence wins, deletes
        tombstone (kept as rows so late stale updates cannot resurrect;
        readers filter ``NOT deleted``). ``view`` is the per-batch
        source view name (unique under pipelined replay).

        Patch mode needs ``payload_cols`` (the table's payload columns)
        and emits one cell-seq CASE arm per column instead of the
        row-level seq guard — a MATCHED row always updates, each cell
        deciding independently."""
        if self.patch:
            if payload_cols is None:
                raise ValueError("patch merge_sql needs payload_cols")
            sets = ",\n            ".join(
                f"t.{c} = {e}"
                for c, e in self.patch_update_exprs(payload_cols).items()
            )
            return f"""
        MERGE INTO {self.table} t
        USING {view} s
        ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET
            {sets}
        WHEN NOT MATCHED THEN INSERT *
        """
        return f"""
        MERGE INTO {self.table} t
        USING {view} s
        ON t.doc_id = s.doc_id
        WHEN MATCHED AND s.op_sequence > t.op_sequence THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """

    # ------------------------------------------------------------- protocol
    def committed(self, batch_id: str) -> bool:
        # restricted to the CURRENT ancestry (history.is_current_
        # ancestor): after rollback_sql, batch ids stamped only in
        # rolled-back snapshots must read as NOT committed so a
        # resuming replayer re-applies them — the filesystem twin
        # de-commits them the same way
        rows = self.spark.sql(
            f"SELECT s.summary['{BATCH_PROP}'] AS b "
            f"FROM {self.table}.snapshots s "
            f"JOIN {self.table}.history h ON s.snapshot_id = h.snapshot_id "
            "WHERE h.is_current_ancestor"
        ).collect()
        return any(r.b == str(batch_id) for r in rows)

    def apply_batch(self, batch_df: DataFrame, batch_id: str | int) -> dict:
        batch_id = str(batch_id)
        # lock-free re-delivery pre-check BEFORE the eager fold below —
        # otherwise a re-delivered committed batch pays a full wasted
        # scan+fold job (and pins checkpoint blocks) just to be skipped;
        # the authoritative check still re-runs under the lock
        if self.committed(batch_id):
            return {"batch_id": batch_id, "skipped": True}
        events = batch_df.drop("event_ts", "batch_hint")
        if self.patch:
            from beehive_data_etl_spark.operators.patch import (
                cell_lww_dedup,
                patch_events,
                widen_for_cells,
            )

            # same invariant as SnapshotSink, same shared helper: cells
            # build against the TABLE's payload ∪ the batch's extras (a
            # narrow delete must clear evolved columns)
            tbl_fields = [
                f
                for f in self.spark.table(self.table).schema.fields
                if f.name not in ("doc_id", "op_sequence", "deleted", "_cell_seq")
            ]
            widened, names = widen_for_cells(
                events, tbl_fields, key="doc_id", seq="op_sequence"
            )
            src = cell_lww_dedup(
                patch_events(widened, key="doc_id", seq="op_sequence",
                             payload_cols=names),
                "doc_id",
                "op_sequence",
                salt_partials=self.salt_partials,
            )
        else:
            deduped = lww_dedup(
                events, "doc_id", "op_sequence", salt_partials=self.salt_partials
            )
            src = deduped.withColumn(
                "deleted", F.col("op") == F.lit("D")
            ).drop("op")
        # materialize the per-key LWW fold OUTSIDE the lock: lww_dedup
        # is lazy, so without this the expensive scan+fold job of every
        # batch would execute inside the MERGE under the lock and
        # pipelined replay (inflight>1) would collapse to serial
        # compute; localCheckpoint runs the job now and cuts lineage,
        # leaving only view-create + conf-stamp + MERGE in the critical
        # section
        src = src.localCheckpoint(eager=True)
        # evolution compares PAYLOAD columns only — op_sequence/deleted
        # live on both sides already, and the table side excludes them,
        # so leaving op_sequence in the batch schema would emit a bogus
        # `ADD COLUMN op_sequence` every batch (cluster-only failure)
        payload = [
            c
            for c in batch_df.columns
            if c not in (
                "op", "event_ts", "batch_hint", "op_sequence", "patch_cols",
                "_cell_seq",
            )
        ]
        batch_schema = batch_df.select(*payload).schema
        view = f"__beehive_batch_{re.sub(r'[^0-9A-Za-z_]', '_', batch_id)}"
        from pyspark.sql import types as T

        with self._commit_lock:
            if self.committed(batch_id):
                return {"batch_id": batch_id, "skipped": True}
            tbl_cols = {f.name: f for f in self.spark.table(self.table).schema.fields}
            _, ddl_log = evolve_schema(
                T.StructType(
                    [tbl_cols[c] for c in tbl_cols if c not in ("op_sequence", "deleted")]
                ),
                batch_schema,
            )
            for stmt in self.evolve_ddl(ddl_log):
                self.spark.sql(stmt)
            # align the batch to the table's POST-DDL schema (same
            # contract as SnapshotSink.apply_batch): `UPDATE SET * /
            # INSERT *` star assignment requires the source to cover
            # every target column, so a batch missing a previously-added
            # column (e.g. `lang`) must project typed nulls, and
            # narrower columns must widen.
            evolved_table_schema = self.spark.table(self.table).schema
            aligned = align_to_schema(src, evolved_table_schema)
            aligned.createOrReplaceTempView(view)
            prop = f"spark.wap.snapshot-property.{BATCH_PROP}"
            # stamp the batch id into the Iceberg snapshot the MERGE
            # creates; set + MERGE + unset all inside the critical
            # section so no other batch can observe or clobber it
            self.spark.conf.set(prop, batch_id)
            merge = (
                self.merge_sql(
                    view,
                    payload_cols=[
                        f.name
                        for f in evolved_table_schema.fields
                        if f.name
                        not in ("doc_id", "op_sequence", "deleted", "_cell_seq")
                    ],
                )
                if self.patch
                else self.merge_sql(view)
            )
            try:
                self.spark.sql(merge)
            finally:
                self.spark.conf.unset(prop)
                self.spark.catalog.dropTempView(view)
        return {"batch_id": batch_id, "skipped": False, "schema_ddl": ddl_log}
