"""spark-submit entry point: checkpointed replay of a WAL directory
into the CDC sink (SURVEY.md §3.2 E1).

Chooses the Iceberg adapter when the runtime is on the classpath and the
target looks like a table identifier; otherwise the snapshot sink.

REPLAY_MODE=stream (default) runs the Structured-Streaming tail
(micro-batches are serial — Spark's foreachBatch contract).
REPLAY_MODE=pipelined runs the incremental replayer with
REPLAY_INFLIGHT (default 4) micro-batches in flight — the
throughput-oriented backfill mode (BENCH/BASELINE.md); commits may land
out of log order, which the sink's LWW semantics make safe.

REPLAY_GAPMON=1 audits the WAL's sequence continuity before replaying
(missing/re-delivered change events — operators.gaps); =strict refuses
a log with holes.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

from beehive_data_etl_spark.sinks.iceberg import IcebergSink, iceberg_available
from beehive_data_etl_spark.sinks.snapshot import SnapshotSink
from beehive_data_etl_spark.sources.eventlog import (
    BASE_ENVELOPE_DDL,
    PATCH_ENVELOPE_DDL,
)
from beehive_data_etl_spark.streaming.replay import replay_incremental, replay_stream


def _derived_views(spark, sink) -> list:
    """Optional downstream incremental consumers, enabled by env:
    REPLAY_AGG_GROUP[,col..] (+ optional REPLAY_AGG_SUM[,col..]) adds an
    AggregateView; REPLAY_MINMAX_GROUP[,col..] (+ REPLAY_MINMAX_MIN /
    REPLAY_MINMAX_MAX column lists) adds a MinMaxView (non-invertible
    IVM with dirty-group rescan); REPLAY_DISTINCT_GROUP[,col..] +
    REPLAY_DISTINCT_COLS[,col..] (+ optional REPLAY_DISTINCT_LGK) adds
    a DistinctView (mergeable-HLL distinct counts, additions merged /
    removals dirty-rescanned); REPLAY_SAMPLE_GROUP[,col..] (+ optional
    REPLAY_SAMPLE_COL, default doc_id, and REPLAY_SAMPLE_K) adds a
    SampleView (deterministic bottom-k hash samples + KMV distinct
    estimates); REPLAY_HIST_GROUP[,col..] + REPLAY_HIST_COL +
    REPLAY_HIST_EDGES=<comma floats> (+ optional REPLAY_HIST_SUM
    column list) adds a HistogramView (exact-IVM binned counts and
    per-bin sums + [weighted] quantile serving, no rescans ever);
    REPLAY_INDEX_COL=<array col> adds a
    TokenIndex;
    REPLAY_NEARDUP=1 adds changelog-driven near-dup detection
    (NearDupView); REPLAY_SHARDS=<k> maintains a k-shard training
    export (ShardExport); REPLAY_HISTORY=1 maintains an SCD2 audit
    history (HistoryView); REPLAY_ENRICH_DIM=<dim root> +
    REPLAY_ENRICH_FK=<fact col> maintains the denormalized
    fact-LEFT-JOIN-dim serving table (EnrichView, join-IVM). All live
    under <target>/_views/ and refresh per
    committed batch (stream mode) or once post-replay (pipelined mode —
    batches commit out of order there, so the only safe refresh point
    is the quiesced end).
    Filesystem sink only: the views refresh off SnapshotSink's pre-image
    changelog; the Iceberg twin exposes changelogs via its own CDC reads
    on a real cluster."""
    root = getattr(sink, "root", None)
    if root is None:
        return []
    views = []
    group = os.environ.get("REPLAY_AGG_GROUP")
    if group:
        from beehive_data_etl_spark.sinks.aggregates import AggregateView

        sums = [c for c in os.environ.get("REPLAY_AGG_SUM", "").split(",") if c]
        views.append(
            AggregateView(
                spark, sink, os.path.join(root, "_views", "agg"),
                group.split(","), sums,
            )
        )
    mm_group = os.environ.get("REPLAY_MINMAX_GROUP")
    if mm_group:
        from beehive_data_etl_spark.sinks.minmax import MinMaxView

        views.append(
            MinMaxView(
                spark, sink, os.path.join(root, "_views", "minmax"),
                mm_group.split(","),
                min_cols=[
                    c for c in os.environ.get("REPLAY_MINMAX_MIN", "").split(",")
                    if c
                ],
                max_cols=[
                    c for c in os.environ.get("REPLAY_MINMAX_MAX", "").split(",")
                    if c
                ],
            )
        )
    nd_group = os.environ.get("REPLAY_DISTINCT_GROUP")
    if nd_group:
        from beehive_data_etl_spark.sinks.distinct import DistinctView

        nd_cols = [
            c for c in os.environ.get("REPLAY_DISTINCT_COLS", "").split(",")
            if c
        ]
        if not nd_cols:
            raise ValueError("REPLAY_DISTINCT_GROUP needs REPLAY_DISTINCT_COLS")
        views.append(
            DistinctView(
                spark, sink, os.path.join(root, "_views", "distinct"),
                nd_group.split(","), nd_cols,
                lg_k=int(os.environ.get("REPLAY_DISTINCT_LGK", "12")),
            )
        )
    sm_group = os.environ.get("REPLAY_SAMPLE_GROUP")
    if sm_group:
        from beehive_data_etl_spark.sinks.sample import SampleView

        views.append(
            SampleView(
                spark, sink, os.path.join(root, "_views", "sample"),
                sm_group.split(","),
                id_col=os.environ.get("REPLAY_SAMPLE_COL", "doc_id"),
                k=int(os.environ.get("REPLAY_SAMPLE_K", "64")),
            )
        )
    hist_group = os.environ.get("REPLAY_HIST_GROUP")
    if hist_group:
        from beehive_data_etl_spark.sinks.histogram import HistogramView

        hist_col = os.environ.get("REPLAY_HIST_COL")
        edges = [
            float(x)
            for x in os.environ.get("REPLAY_HIST_EDGES", "").split(",")
            if x
        ]
        if not hist_col or len(edges) < 2:
            raise ValueError(
                "REPLAY_HIST_GROUP needs REPLAY_HIST_COL and >=2 "
                "REPLAY_HIST_EDGES"
            )
        views.append(
            HistogramView(
                spark, sink, os.path.join(root, "_views", "histogram"),
                hist_group.split(","), hist_col, edges,
                sum_cols=[
                    c
                    for c in os.environ.get("REPLAY_HIST_SUM", "").split(",")
                    if c
                ],
            )
        )
    index_col = os.environ.get("REPLAY_INDEX_COL")
    if index_col:
        from beehive_data_etl_spark.sinks.token_index import TokenIndex

        views.append(
            TokenIndex(
                spark, sink, os.path.join(root, "_views", "token_index"),
                token_col=index_col,
            )
        )
    if os.environ.get("REPLAY_NEARDUP"):
        from beehive_data_etl_spark.functions.incremental_dedup import NearDupView

        views.append(
            NearDupView(spark, sink, os.path.join(root, "_views", "neardup"))
        )
    ann_col = os.environ.get("REPLAY_ANN_COL")
    if ann_col:
        # REPLAY_ANN_COL=<array<float> payload column> (+ optional
        # REPLAY_ANN_CELLS): maintain the IVF ANN index
        # (sinks/ann_index.py) for similarity serving
        from beehive_data_etl_spark.sinks.ann_index import AnnIndex

        views.append(
            AnnIndex(
                spark, sink, os.path.join(root, "_views", "ann"),
                vec_col=ann_col,
                n_cells=int(os.environ.get("REPLAY_ANN_CELLS", "16")),
            )
        )
    if os.environ.get("REPLAY_HISTORY"):
        from beehive_data_etl_spark.sinks.history import HistoryView

        views.append(
            HistoryView(spark, sink, os.path.join(root, "_views", "history"))
        )
    shards_k = os.environ.get("REPLAY_SHARDS")
    if shards_k:
        from beehive_data_etl_spark.sinks.shards import ShardExport

        views.append(
            ShardExport(
                spark, sink, os.path.join(root, "_views", "shards"),
                k=int(shards_k),
            )
        )
    enrich_dim = os.environ.get("REPLAY_ENRICH_DIM")
    if enrich_dim:
        # REPLAY_ENRICH_DIM=<dim table root> + REPLAY_ENRICH_FK=<fact
        # column holding dim keys>: maintain the denormalized
        # fact-LEFT-JOIN-dim serving table (join-IVM, sinks/enrich.py)
        from beehive_data_etl_spark.sinks.enrich import EnrichView
        from beehive_data_etl_spark.sinks.snapshot import SnapshotSink

        fk = os.environ.get("REPLAY_ENRICH_FK")
        if not fk:
            raise ValueError("REPLAY_ENRICH_DIM needs REPLAY_ENRICH_FK")
        views.append(
            EnrichView(
                spark, sink, SnapshotSink.open(spark, enrich_dim),
                os.path.join(root, "_views", "enriched"), fk=fk,
            )
        )
    return views


def _stream_schema_ddl(spark, wal_dir: str, patch: bool) -> str:
    """Stream mode needs a fixed source schema up front (readStream
    contract). Default: the standard envelope DDL. REPLAY_SCHEMA=auto
    derives the WAL's own merged superset schema from its parquet
    footers (one metadata pass, cost bounded by the log's retention
    window) — the knob that lets a payload beyond the base envelope
    (e.g. an embedding column) flow through the stream deployment
    path. Any other REPLAY_SCHEMA value is taken as an explicit DDL
    string. Pipelined mode needs none of this: each micro-batch reads
    its own merged schema."""
    v = os.environ.get("REPLAY_SCHEMA")
    if not v:
        return PATCH_ENVELOPE_DDL if patch else BASE_ENVELOPE_DDL
    if v == "auto":
        from beehive_data_etl_spark.sinks.snapshot import _ddl

        return _ddl(
            spark.read.option("mergeSchema", "true").parquet(wal_dir).schema
        )
    return v


def _files_per_batch() -> "int | str":
    """REPLAY_FILES_PER_BATCH: an int, or "auto" to size micro-batches
    by events (REPLAY_TARGET_EVENTS, default 500k) from the log's
    footer row counts — deterministic across resumes (see
    replay_incremental)."""
    v = os.environ.get("REPLAY_FILES_PER_BATCH", "8")
    return v if v == "auto" else int(v)


def _replicator(spark, sink):
    """REPLAY_REPLICATE_TO=<path> tails this table's changelog into a
    second SnapshotSink after every epoch (stream mode) or once after
    the replay (pipelined — out-of-order commits make the quiesced end
    the only safe sync point). REPLAY_REPLICATE_BUCKETS sizes the
    replica (default: same as source). REPLAY_REPLICATE_WHERE makes it
    a FILTERED replica — a JSON conjunct list in the scan_where
    grammar, e.g. '[["source","=","web"],["n_tok",">=",100]]'.
    Filesystem sink only — the replicator reads SnapshotSink
    snapshots."""
    target = os.environ.get("REPLAY_REPLICATE_TO")
    if not target:
        return None
    if not isinstance(sink, SnapshotSink):
        raise ValueError("REPLAY_REPLICATE_TO requires the filesystem sink")
    from beehive_data_etl_spark.sinks.replicate import Replicator

    dst = SnapshotSink(
        spark,
        target,
        n_buckets=int(
            os.environ.get("REPLAY_REPLICATE_BUCKETS", str(sink.n_buckets))
        ),
    )
    where_env = os.environ.get("REPLAY_REPLICATE_WHERE")
    where = None
    if where_env:
        import json as _json

        where = [tuple(p) for p in _json.loads(where_env)]
    return Replicator(
        sink,
        dst,
        name=os.environ.get("REPLAY_REPLICATE_NAME", "repl"),
        where=where,
    )


def _outbox(sink):
    """REPLAY_OUTBOX_TO=<dir> publishes this table's changelog as
    Kafka-record-shaped JSON change events (sinks.outbox) after every
    epoch (stream) / once post-replay (pipelined) — the outbound CDC
    feed for non-Spark consumers. REPLAY_OUTBOX_PARTITIONS sizes the
    simulated topic (default 8); REPLAY_OUTBOX_WHERE (JSON conjuncts,
    scan_where grammar) makes it a filtered subscription.
    Filesystem sink only."""
    out = os.environ.get("REPLAY_OUTBOX_TO")
    if not out:
        return None
    if not isinstance(sink, SnapshotSink):
        raise ValueError("REPLAY_OUTBOX_TO requires the filesystem sink")
    from beehive_data_etl_spark.sinks.outbox import Outbox

    where_env = os.environ.get("REPLAY_OUTBOX_WHERE")
    where = None
    if where_env:
        import json as _json

        where = [tuple(p) for p in _json.loads(where_env)]
    return Outbox(
        sink,
        out,
        name=os.environ.get("REPLAY_OUTBOX_NAME", "outbox"),
        n_partitions=int(os.environ.get("REPLAY_OUTBOX_PARTITIONS", "8")),
        where=where,
    )


def main() -> None:
    wal_dir, target = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("beehive-cdc-replay").getOrCreate()
    # REPLAY_TXN=1: the WAL is a MULTI-TABLE transactional log
    # (eventlog.TXN_ENVELOPE_DDL — C/R markers + table_name/txn_id).
    # <target> becomes the deployment root: per-table sinks under
    # tables/<name>, the coordinator's pending spill + consistent
    # points under coord/. REPLAY_TXN_TABLES names the tables
    # (default docs,meta). Transaction release is inherently ordered,
    # so both modes run serially (pipelined forces inflight=1).
    if os.environ.get("REPLAY_TXN") == "1":
        if "/" not in target:
            raise ValueError(
                "REPLAY_TXN targets a filesystem root (consistent-point "
                "time travel rides SnapshotSink.read_state); point the "
                "Iceberg twin at per-table MERGEs instead"
            )
        from beehive_data_etl_spark.sources.eventlog import TXN_ENVELOPE_DDL
        from beehive_data_etl_spark.streaming.txn import TxnCoordinator

        tables = [
            t.strip()
            for t in os.environ.get("REPLAY_TXN_TABLES", "docs,meta").split(",")
            if t.strip()
        ]
        sinks = {
            t: SnapshotSink(
                spark,
                os.path.join(target, "tables", t),
                n_buckets=int(os.environ.get("REPLAY_N_BUCKETS", "4096")),
                salt_partials=int(os.environ.get("REPLAY_SALT", "8")),
            )
            for t in tables
        }
        coord = TxnCoordinator(spark, os.path.join(target, "coord"), sinks)
        if os.environ.get("REPLAY_MODE", "stream") == "pipelined":
            t0 = time.time()
            batches = replay_incremental(
                spark, wal_dir, coord,
                files_per_batch=_files_per_batch(),
                target_events_per_batch=int(
                    os.environ.get("REPLAY_TARGET_EVENTS", "500000")
                ),
                inflight=1,
            )
            # REPLAY_TXN_TTL=<points>: transaction-timeout maintenance
            # at the quiesced end (coordinator ops run between batches)
            ttl = os.environ.get("REPLAY_TXN_TTL")
            expired = (
                coord.expire_pending(int(ttl))["expired"] if ttl else None
            )
            print(
                "REPLAY_METRICS "
                + json.dumps(
                    {
                        "replay_wall_s": round(time.time() - t0, 2),
                        "n_batches": len(batches),
                        "point": (coord.latest_point() or {}).get("n"),
                        "expired_txns": expired,
                    }
                )
            )
        else:
            replay_stream(
                spark, wal_dir, coord,
                checkpoint_dir=os.path.join(target, "_checkpoint"),
                schema_ddl=TXN_ENVELOPE_DDL,
                max_files_per_trigger=8,
            )
        return
    # REPLAY_PATCH=1: the WAL carries partial updates (op 'P' +
    # patch_cols masks, eventlog.PATCH_ENVELOPE_DDL) — fold per cell
    patch = os.environ.get("REPLAY_PATCH") == "1"
    if iceberg_available(spark) and "/" not in target:
        # per-cell twin: MERGE with one cell-seq CASE arm per column
        # (IcebergSink.patch_update_exprs — semantics proven equivalent
        # to the engine fold by the adapter's simulation test)
        sink = IcebergSink(spark, target, patch=patch)
    else:
        audit = None
        if os.environ.get("REPLAY_AUDIT") == "standard":
            # write-audit-publish gate on every batch (operators.audit):
            # a batch violating the token-payload contract aborts before
            # anything publishes
            from beehive_data_etl_spark.operators.audit import (
                standard_token_audit,
            )

            audit = standard_token_audit(
                max_violations=int(os.environ.get("REPLAY_AUDIT_TOLERANCE", "0")),
                patch=patch,
            )
        sink = SnapshotSink(
            spark,
            target,
            # table sizing knobs (SCALE.md): ~4096 buckets for the 10^10
            # -event cluster table; local smokes pass a smaller count
            n_buckets=int(os.environ.get("REPLAY_N_BUCKETS", "4096")),
            salt_partials=int(os.environ.get("REPLAY_SALT", "8")),
            audit=audit,
            patch=patch,
            # REPLAY_LINEAGE=0 disables per-batch lineage metrics —
            # the bench smoke sets it so the deployment rate is
            # apples-to-apples with the in-process workers (which
            # measure lineage=False); production default stays on
            lineage=os.environ.get("REPLAY_LINEAGE", "1") == "1",
            # REPLAY_TARGET_FILE_ROWS caps rows per data file (0 = no
            # cap): operator-sized files + per-file stats pruning
            target_file_rows=(
                int(os.environ["REPLAY_TARGET_FILE_ROWS"])
                if os.environ.get("REPLAY_TARGET_FILE_ROWS")
                else None
            ),
        )
    # REPLAY_GAPMON=1|strict: pre-replay transport-integrity audit
    # (operators.gaps) — ONE column-pruned scan of the WAL reporting
    # re-delivered and MISSING sequence numbers, the loss class the
    # sink's LWW would otherwise absorb silently. 'strict' refuses to
    # replay a log with holes (missing change events = a corrupt
    # replica no amount of replaying can fix).
    gapmon = os.environ.get("REPLAY_GAPMON")
    if gapmon:
        from beehive_data_etl_spark.operators.gaps import (
            sequence_gap_ranges,
            sequence_gap_summary,
        )

        log_df = spark.read.parquet(wal_dir).select("op_sequence")
        s = sequence_gap_summary(log_df).collect()[0].asDict()
        if s["n_missing"]:
            first = sequence_gap_ranges(log_df, block_size=1 << 20).head(5)
            s["first_gaps"] = [
                [r.gap_start, r.gap_end] for r in first
            ]
        print("GAPMON " + json.dumps(s))
        if gapmon == "strict" and s["n_missing"]:
            raise RuntimeError(
                f"WAL has {s['n_missing']} missing sequence numbers "
                "(REPLAY_GAPMON=strict)"
            )
    # REPLAY_BRANCH=<name>: land the whole replay on a BRANCH of the
    # target table (created if absent, resumed if present) and publish
    # it atomically by fast_forward at the quiesced end — the staged
    # multi-commit write-audit-publish deployment shape. Main serves
    # readers untouched until the publish; a refused publish (another
    # writer moved main) fails the job LOUDLY with the branch intact
    # for manual re-apply/inspection. REPLAY_BRANCH_PUBLISH=0 stages
    # without publishing (audit offline, fast_forward later). Derived
    # views / replicas / outbox follow MAIN, so they refresh after the
    # publish, never per staged epoch.
    branch = os.environ.get("REPLAY_BRANCH")
    write_sink = sink
    if branch:
        if not isinstance(sink, SnapshotSink):
            raise ValueError("REPLAY_BRANCH requires the filesystem sink")
        if os.environ.get("REPLAY_MODE", "stream") != "pipelined":
            # stream mode's checkpoint marks WAL files consumed the
            # moment the BRANCH ingests them — abandoning the branch
            # would silently lose those events for main (the offset
            # log never consults sink.committed). Pipelined mode's
            # resume is committed-id-driven, so an abandoned branch
            # replays cleanly onto main.
            raise ValueError(
                "REPLAY_BRANCH requires REPLAY_MODE=pipelined — the "
                "streaming checkpoint cannot un-consume files staged "
                "on an abandoned branch"
            )
        if sink.current_snapshot() is None:
            # a branch needs a fork point: seed an empty table commit?
            # No — refuse; first replay bootstraps main directly.
            raise ValueError(
                "REPLAY_BRANCH needs an existing table (bootstrap the "
                "first replay without it)"
            )
        if branch not in sink.branches():
            sink.create_branch(branch)
        write_sink = sink.branch(branch)

    def _publish_branch() -> None:
        if branch and os.environ.get("REPLAY_BRANCH_PUBLISH", "1") != "0":
            print("BRANCH_PUBLISH " + json.dumps(sink.fast_forward(branch)))

    views = _derived_views(spark, sink)
    replicator = _replicator(spark, sink)
    outbox = _outbox(sink)
    if os.environ.get("REPLAY_MODE", "stream") == "pipelined":
        t0 = time.time()
        batches = replay_incremental(
            spark,
            wal_dir,
            write_sink,
            files_per_batch=_files_per_batch(),
            target_events_per_batch=int(
                os.environ.get("REPLAY_TARGET_EVENTS", "500000")
            ),
            inflight=int(os.environ.get("REPLAY_INFLIGHT", "4")),
        )
        # one machine-readable line so callers (bench smoke, cluster
        # drivers) can separate replay throughput from JVM/submit spin-up
        print(
            "REPLAY_METRICS "
            + json.dumps(
                {"replay_wall_s": round(time.time() - t0, 2), "n_batches": len(batches)}
            )
        )
        _publish_branch()
        for v in views:
            v.refresh()
        if views:
            print(
                "VIEW_METRICS "
                + json.dumps([type(v).__name__ for v in views])
            )
        if replicator is not None:
            replicator.sync()
        if outbox is not None:
            outbox.sync()
        return

    def _refresh_views(epoch_id: int) -> None:
        for v in views:
            v.refresh()
        if replicator is not None:
            replicator.sync()
        if outbox is not None:
            outbox.sync()

    replay_stream(
        spark,
        wal_dir,
        write_sink,
        checkpoint_dir=f"{target.rstrip('/')}/_checkpoint"
        if "/" in target
        else f"/tmp/ckpt-{target.replace('.', '-')}",
        schema_ddl=_stream_schema_ddl(spark, wal_dir, patch),
        max_files_per_trigger=8,
        watermark=("event_ts", "10 minutes"),
        on_batch_commit=(
            _refresh_views
            if (views or replicator is not None or outbox is not None)
            else None
        ),
    )


if __name__ == "__main__":
    main()
