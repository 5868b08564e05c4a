"""SparkSession-free access to a SnapshotSink table's metadata.

The Spark Python Data Source (``sources/spark_datasource.py``) plans
partitions and resolves offsets inside Python worker processes that
have **no SparkSession and no JVM** — ``DataSource.schema()`` /
``reader.partitions()`` run in a forked planner worker, and the
streaming reader lives in its own long-running driver-side worker.
Everything those hooks need from the table is plain JSON under
``<root>/_snapshots/``, so this module re-implements exactly the
metadata surface of ``sinks/snapshot.py`` (``current_snapshot``,
``snapshot``, ``resolve_ref``, ``tags``/``move_tag``, the Replicator's
window-refusal guards) as standalone file I/O.  Behavioral parity with
the sink is pinned by ``tests/test_spark_datasource.py`` — if the sink
ever changes its on-disk metadata, those tests break loudly here.

Also here: a parser from the engine's stored schema DDL (written by
``snapshot._ddl`` via ``DataType.simpleString()``) to a
``pyarrow.Schema``, so executor-side readers can align old-schema delta
files to the table schema without Spark.  The type mapping mirrors
Spark's own parquet writer output (verified against
``pyspark.sql.pandas.types.to_arrow_schema`` in tests).
"""

from __future__ import annotations

import fcntl
import json
import os
import uuid

import pyarrow as pa

KEY = "doc_id"
SEQ = "op_sequence"
CELL = "_cell_seq"
DELETED = "deleted"


# --------------------------------------------------------------- snapshots
def snapshots_dir(root: str) -> str:
    return os.path.join(root, "_snapshots")


def current_snapshot(root: str) -> dict | None:
    """Twin of ``SnapshotSink.current_snapshot`` (snapshot.py)."""
    try:
        with open(os.path.join(snapshots_dir(root), "CURRENT")) as fh:
            name = fh.read().strip()
        with open(os.path.join(snapshots_dir(root), name)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def load_snapshot(root: str, version: int) -> dict:
    """Twin of ``SnapshotSink.snapshot``: loads one committed snapshot,
    naming the expire_snapshots floor when the version was retired."""
    try:
        with open(
            os.path.join(snapshots_dir(root), f"v{version:06d}.json")
        ) as fh:
            return json.load(fh)
    except FileNotFoundError:
        head = current_snapshot(root)
        floor = 1 if head is None else head.get("snapshot_floor", 1)
        if version < floor:
            raise ValueError(
                f"snapshot v{version} was expired (snapshot_floor="
                f"{floor}); time travel / changelog windows below the "
                "floor are gone — tag versions you need to keep before "
                "expire_snapshots()"
            ) from None
        raise


def load_tags(root: str) -> dict[str, int]:
    try:
        with open(os.path.join(snapshots_dir(root), "TAGS.json")) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def resolve_ref(root: str, ref) -> int:
    """Twin of ``SnapshotSink.resolve_ref``: ints pass through, strings
    resolve via the tag table (numeric strings pass through too, so
    option values — always strings — can carry plain versions)."""
    if isinstance(ref, str) and not ref.lstrip("-").isdigit():
        tags = load_tags(root)
        if ref not in tags:
            raise KeyError(f"no tag {ref!r} (known: {sorted(tags)})")
        return tags[ref]
    return int(ref)


def pin_tag(root: str, name: str, version: int) -> None:
    """Twin of ``SnapshotSink.move_tag`` for cursor-style tags, under
    the same cross-process flock the sink's tag writers hold — so a
    streaming reader's retention pin can never interleave with a
    concurrent ``tag``/``drop_tag``/``move_tag`` through a sink object
    and silently drop either write.  One atomic tags-file replace: no
    crash window where the pin is absent."""
    lock_fd = os.open(
        os.path.join(snapshots_dir(root), "LOCK"), os.O_CREAT | os.O_RDWR
    )
    try:
        fcntl.flock(lock_fd, fcntl.LOCK_EX)
        load_snapshot(root, version)  # must exist (raises otherwise)
        tags = load_tags(root)
        tags[name] = int(version)
        path = os.path.join(snapshots_dir(root), "TAGS.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(tags, fh)
        os.replace(tmp, path)
    finally:
        fcntl.flock(lock_fd, fcntl.LOCK_UN)
        os.close(lock_fd)


# ------------------------------------------------------------ window guard
def refuse_unstreamable_window(root: str, frm: int, to: int) -> None:
    """Twin of ``Replicator._refuse_unreplicable_window``
    (sinks/replicate.py), plus the column alters the DS stream cannot
    bridge: a changelog window spanning a rollback / backfill / purge /
    drop_column / rename_column cannot be expressed as forward change
    events at truthful op_sequences (the per-case arguments live on the
    Replicator).  The stream fails loudly with recovery guidance rather
    than silently diverging its consumer."""
    for v in range(frm + 1, to + 1):
        m = load_snapshot(root, v).get("metrics", {})
        for marker in ("rollback_to", "backfill", "purge"):
            if marker in m:
                raise RuntimeError(
                    f"upstream {marker} at v{v} inside stream window "
                    f"({frm}, {to}]: no forward change event can express "
                    "it (see sinks/replicate.py for the per-case "
                    "argument). Reconcile the consumer out of band, then "
                    "restart the stream from a fresh checkpoint with "
                    f"startingVersion={to}."
                )
        for op in ("drop_column", "rename_column"):
            if op in m:
                raise RuntimeError(
                    f"upstream {op} at v{v} inside stream window "
                    f"({frm}, {to}]: the stream's schema is fixed at "
                    "start and rewritten rows keep their op_sequence. "
                    "Apply the same alter on the consumer, then restart "
                    f"the stream from a fresh checkpoint with "
                    f"startingVersion={v}."
                )


# --------------------------------------------------------------- DDL → arrow
_PRIMITIVES: dict[str, pa.DataType] = {
    "string": pa.string(),
    "boolean": pa.bool_(),
    "tinyint": pa.int8(),
    "smallint": pa.int16(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "date": pa.date32(),
    "binary": pa.binary(),
    # session timezone is pinned to UTC (session.py); Spark writes
    # parquet TIMESTAMP as int64 micros adjusted-to-UTC
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
}


def _split_top(s: str) -> list[str]:
    """Split on commas not nested inside <> or ()."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def type_to_arrow(t: str) -> pa.DataType:
    """``DataType.simpleString()`` → arrow type, for every type the
    engine stores (primitives, decimal, array/map/struct nests)."""
    t = t.strip()
    low = t.lower()
    if low in _PRIMITIVES:
        return _PRIMITIVES[low]
    if low.startswith("decimal(") and low.endswith(")"):
        p, s = low[len("decimal(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    if low.startswith("array<") and t.endswith(">"):
        return pa.list_(type_to_arrow(t[len("array<") : -1]))
    if low.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[len("map<") : -1])
        return pa.map_(type_to_arrow(k), type_to_arrow(v))
    if low.startswith("struct<") and t.endswith(">"):
        fields = []
        for part in _split_top(t[len("struct<") : -1]):
            name, _, sub = part.partition(":")
            fields.append(pa.field(name.strip(), type_to_arrow(sub)))
        return pa.struct(fields)
    raise ValueError(f"unsupported DDL type {t!r}")


def ddl_to_arrow(ddl: str) -> pa.Schema:
    """Parse the engine's stored schema DDL (``snapshot._ddl`` output:
    ``name type, name type, …``) into a ``pyarrow.Schema``.  Parity
    with Spark's own parser is pinned in tests via
    ``to_arrow_schema(StructType.fromDDL(ddl))``."""
    fields = []
    for part in _split_top(ddl):
        name, _, t = part.partition(" ")
        fields.append(pa.field(name.strip(), type_to_arrow(t)))
    return pa.schema(fields)
