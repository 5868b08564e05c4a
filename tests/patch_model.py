"""Shared fold-left model + event strategy for the per-cell LWW patch
tests (test_patch.py operator-level, test_patch_sink.py sink-level).
ONE canonical model so the two suites cannot drift apart (review-found:
the original copies already disagreed on delete-payload handling).

Canonical wire behavior deliberately includes junk: a 'D' event CARRIES
payload values (real sources send them) — the engine must normalize
deletes to all-NULL cells, and the model expects None for every cell of
a deleted row."""

from hypothesis import strategies as st

PAYLOAD = ["a", "b", "c"]
SCHEMA = (
    "op string, op_sequence long, doc_id string, "
    "a double, b string, c long, patch_cols array<string>"
)


def ops_strategy(max_ops: int = 50):
    op_entry = st.tuples(
        st.sampled_from(["I", "U", "D", "P", "P", "P"]),  # patch-heavy
        st.integers(min_value=0, max_value=5),  # doc index
        st.lists(st.sampled_from(PAYLOAD), min_size=0, max_size=3, unique=True),
        st.integers(min_value=0, max_value=99),  # value seed
    )
    return st.lists(op_entry, min_size=1, max_size=max_ops)


def to_events(ops):
    """(op, doc, mask, seed) tuples → wire envelope rows. Masked values
    are populated for EVERY op (including D — junk the engine must
    normalize away); I/U carry the full payload."""
    events = []
    for seq, (op, doc, mask, vs) in enumerate(ops, start=1):
        events.append(
            {
                "op": op,
                "op_sequence": seq,
                "doc_id": f"doc-{doc}",
                "a": float(vs) if (op in ("I", "U") or "a" in mask) else None,
                "b": f"s{vs}" if (op in ("I", "U") or "b" in mask) else None,
                "c": vs * 10 if (op in ("I", "U") or "c" in mask) else None,
                "patch_cols": mask if op == "P" else None,
            }
        )
    return events


def model(events):
    """Plain-Python per-cell fold-left (events applied in seq order):
    {doc_id: {op_sequence, deleted, a, b, c}} over ALL rows (tombstones
    included, mirroring read_state)."""
    cells: dict[str, dict] = {}
    top: dict[str, int] = {}
    for e in sorted(events, key=lambda e: e["op_sequence"]):
        k, stt = e["doc_id"], cells.setdefault(e["doc_id"], {})
        top[k] = max(top.get(k, 0), e["op_sequence"])
        if e["op"] == "P":
            for c in e["patch_cols"] or []:
                if c in PAYLOAD:
                    stt[c] = e[c]
        else:
            for c in PAYLOAD:
                stt[c] = None if e["op"] == "D" else e[c]
            stt["deleted"] = e["op"] == "D"
    return {
        k: {
            "op_sequence": top[k],
            "deleted": bool(stt.get("deleted", False)),
            **{c: stt.get(c) for c in PAYLOAD},
        }
        for k, stt in cells.items()
    }
