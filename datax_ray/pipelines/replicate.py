"""Lake→lake incremental replication (CDC mirroring between lakes).

Composes two things the engine already guarantees into a third: the change
feed (pipelines/feed.py — a complete, sufficient delta per epoch) and the
exactly-once replay sink (pipelines/replay.py). Each source epoch's feed
rows are converted back into CHANGES_SCHEMA events and replayed into the
destination lake as ONE destination epoch, so a replica lags the source by
a bounded number of epochs and catches up by shipping O(changed bytes),
never by re-reading source state.

Epoch granularity: the replay watermark dedup is a GLOBAL committed
lsn-high per epoch (normalize.py) — sound because source-log segments
carry monotone LSN slices. Fragment files WITHIN one source epoch hold
overlapping LSN ranges (one per key range), so SPLITTING a source epoch
across destination epochs could drop rows of the later half as "already
seen". COMBINING whole source epochs is safe (LWW is order-free and each
epoch's feed delta is complete), so by default the full catch-up window
lands as ONE destination epoch — the fixed per-epoch pipeline cost is
paid once per sync, not once per source epoch a replica fell behind.
`per_epoch=True` keeps strict epoch mirroring for replicas that need
per-epoch time travel.

Exactly-once across crashes, with no extra coordination state: replicated
segment names are deterministic (seg-rep<epoch>-...-<digest of source
file path>), and their bytes are a pure function of committed source
fragments — a crashed run's rerun rewrites identical files, and the
destination manifest's committed-segments set (the same mechanism that
makes upstream replay resumable) skips whatever already applied.
`replicated_through()` is derived from those committed names, not from a
side file that could desync.

Schema evolution replicates too: the source's committed schema diff
between consecutive epochs is re-expressed as synthetic op='ddl' events
in a leading segment (ts=epoch-of-1970 so every (ts,lsn)-ordered oracle
applies them first; the engine applies DDL at epoch boundaries anyway).

The destination may use a DIFFERENT layout (num_partitions /
salt_turn_width) — replication re-shards by conv_id hash on apply, which
is how a replica on a bigger/smaller cluster gets a fitting layout.
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from datax_ray.state.fs import fs_for
from datax_ray.schemas import (
    DELETED_COL,
    INTERNAL_COLS,
    LSN_COL,
    TRANSCRIPTS_SCHEMA,
    schema_from_json,
    schema_to_json,
)
from datax_ray.state.manifest import Manifest

_SEG_RE = re.compile(r"^seg-rep(\d{6})-")


def _type_name(t: pa.DataType) -> str:
    from datax_ray.state.schema_tracker import _NAMED_TYPES

    for name, typ in _NAMED_TYPES.items():
        if typ == t:
            return name
    raise ValueError(f"no ddl type name for {t}")


def _schema_ddl_diff(prev: pa.Schema, cur: pa.Schema) -> list[str]:
    """Synthetic DDL json payloads that evolve `prev` into `cur`
    (payload columns only; internal columns never diff)."""
    import json

    out: list[str] = []
    for f in cur:
        if f.name in INTERNAL_COLS:
            continue
        i = prev.get_field_index(f.name)
        if i == -1:
            out.append(
                json.dumps(
                    {"action": "add_column", "name": f.name, "type": _type_name(f.type)}
                )
            )
        elif prev.field(i).type != f.type:
            out.append(
                json.dumps(
                    {"action": "widen", "name": f.name, "type": _type_name(f.type)}
                )
            )
    return out


def replicated_through(dst_lake: str) -> int:
    """Highest source epoch whose replicated segments the destination has
    COMMITTED (exactly-once bookkeeping read straight off the destination
    manifest); -1 before the first sync."""
    m = Manifest(dst_lake)
    best = -1
    for name in m.committed_segments():
        match = _SEG_RE.match(name)
        if match:
            best = max(best, int(match.group(1)))
    return best


class _SegmentConverter:
    """One feed plan item in → one replicated change segment out (callable
    class: schema tracker built once per worker). Reads a committed source
    fragment, unifies pre-DDL schemas to the source epoch's, converts lake
    rows back to change events (lsn=_lsn, op=insert|delete by tombstone
    flag), and writes seg-rep...-<digest>.parquet atomically with
    deterministic bytes — the exactly-once unit."""

    def __init__(self, src_lake: str, out_dir: str, schema_json):
        from datax_ray.state.schema_tracker import SchemaTracker

        self.__name__ = "_SegmentConverter"
        self.src_lake = src_lake
        self.out_dir = out_dir
        self.schema = schema_from_json(schema_json)
        self.tracker = SchemaTracker(self.schema)
        self.payload_cols = [
            f.name
            for f in self.schema
            if f.name not in INTERNAL_COLS
            and f.name not in ("conv_id", "turn_idx", "ts")
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for item in t.to_pylist():
            epoch, rel = int(item["epoch"]), item["file"]
            frag = self.tracker.unify(
                pq.read_table(
                    fs_for(self.src_lake).open_input(
                        os.path.join(self.src_lake, rel)
                    )
                )
            )
            deleted = pc.fill_null(frag[DELETED_COL], False)
            cols: dict = {
                "lsn": frag[LSN_COL],
                "ts": frag["ts"],
                "op": pc.if_else(deleted, "delete", "insert"),
                "conv_id": frag["conv_id"],
                "turn_idx": frag["turn_idx"],
            }
            for name in self.payload_cols:
                # a delete event carries no payload (upstream contract;
                # tombstone fragments already store nulls, this just pins it)
                col = frag[name]
                cols[name] = pc.if_else(deleted, pa.scalar(None, col.type), col)
            cols["ddl"] = pa.nulls(frag.num_rows, pa.string())
            seg = pa.table(cols)
            digest = hashlib.sha1(rel.encode()).hexdigest()[:12]
            name = f"seg-rep{epoch:06d}-b-{digest}.parquet"
            path = os.path.join(self.out_dir, name)
            sink = pa.BufferOutputStream()
            pq.write_table(seg, sink, compression="zstd", compression_level=1)
            fs_for(path).put(path, sink.getvalue())
            rows.append({"epoch": epoch, "segment": name, "rows": seg.num_rows})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("epoch", pa.int32()), ("segment", pa.string()), ("rows", pa.int64())]
            ),
        )


def _write_ddl_segment(
    out_dir: str, epoch: int, ddl_jsons: list[str]
) -> str | None:
    if not ddl_jsons:
        return None
    n = len(ddl_jsons)
    seg = pa.table(
        {
            "lsn": pa.array(range(n), pa.int64()),
            # epoch-of-1970 timestamps: strictly before any real event, so
            # a (ts, lsn)-ordered oracle applies DDL first — matching the
            # engine's apply-at-epoch-boundary rule.
            "ts": pa.array(list(range(n)), pa.timestamp("us")),
            "op": pa.array(["ddl"] * n),
            "conv_id": pa.nulls(n, pa.string()),
            "turn_idx": pa.nulls(n, pa.int32()),
            "role": pa.nulls(n, pa.string()),
            "text": pa.nulls(n, pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ddl": pa.array(ddl_jsons, pa.string()),
        }
    )
    name = f"seg-rep{epoch:06d}-a-ddl.parquet"
    path = os.path.join(out_dir, name)
    sink = pa.BufferOutputStream()
    pq.write_table(seg, sink, compression="zstd", compression_level=1)
    fs_for(path).put(path, sink.getvalue())
    return name


def replicate(
    src_lake: str,
    dst_lake: str,
    *,
    num_partitions: int = 16,
    frag_ranges: int = 8,
    salt_turn_width: int | None = None,
    compact_every: int = 8,
    segments_dir: str | None = None,
    metrics: bool = False,
    per_epoch: bool = False,
    from_epoch: int | None = None,
) -> dict:
    """Catch the destination lake up to the source's committed epoch.
    Idempotent; resumable after a crash at any point; O(changed bytes) per
    sync. Returns {"from_epoch", "to_epoch", "epochs_applied", "segments"}.
    Layout kwargs only matter on the FIRST sync (they bootstrap the
    destination); afterwards the destination's frozen layout wins.

    By default the whole catch-up window (last_replicated, committed]
    lands as ONE destination epoch: COMBINING source epochs is sound
    (LWW is order-free and the feed ships complete per-epoch deltas; only
    SPLITTING one source epoch across destination epochs would break the
    watermark dedup — see the module docstring), and it amortizes the
    fixed per-epoch pipeline cost, which dominates when a replica is many
    epochs behind. `per_epoch=True` mirrors the source epoch-for-epoch
    instead, preserving per-epoch time travel on the replica at the cost
    of one replay round per source epoch."""
    m_src = Manifest(src_lake)
    committed = m_src.committed_epoch()
    last = replicated_through(dst_lake)
    if from_epoch is not None:
        # explicit sync start — the BRANCH-MERGE case: a clone's history
        # below the branch point is one collapsed record (no per-epoch
        # feed), and the merge target already holds that shared prefix, so
        # the correct window is exactly (branch_point, head]. Never moves
        # the start backwards past epochs already replicated (exactly-once
        # bookkeeping stays authoritative).
        last = max(last, int(from_epoch))
    out_dir = segments_dir or os.path.join(dst_lake, "_incoming")
    from datax_ray.state.fs import is_remote

    if not is_remote(out_dir):
        os.makedirs(out_dir, exist_ok=True)
    else:
        raise ValueError(
            "replicate: segment staging dir must be local-path-readable for "
            "the replay engine (ray.data.read_parquet) — pass segments_dir= "
            "pointing at shared POSIX/NFS storage when the destination lake "
            "is on an object store"
        )

    replay_kwargs = dict(
        num_partitions=num_partitions,
        frag_ranges=frag_ranges,
        salt_turn_width=salt_turn_width,
        compact_every=compact_every,
        metrics=metrics,
    )
    epochs_applied = 0
    total_segments = 0
    windows = (
        [(e - 1, e) for e in range(last + 1, committed + 1)]
        if per_epoch
        else ([(last, committed)] if committed > last else [])
    )
    for lo, hi in windows:
        applied, nseg = _sync_window(m_src, src_lake, dst_lake, out_dir, lo, hi, replay_kwargs)
        epochs_applied += applied
        total_segments += nseg
    return {
        "from_epoch": last,
        "to_epoch": committed,
        "epochs_applied": epochs_applied,
        "segments": total_segments,
    }


def _sync_window(
    m_src: Manifest,
    src_lake: str,
    dst_lake: str,
    out_dir: str,
    from_e: int,
    to_e: int,
    replay_kwargs: dict,
) -> tuple[int, int]:
    """Ship source epochs (from_e, to_e] as one destination epoch; returns
    (epochs_applied, segments_written)."""
    from datax_ray.pipelines.feed import plan_change_feed
    from datax_ray.pipelines.replay import ReplayConfig, replay

    plan = plan_change_feed(src_lake, from_e, to_e)
    seg_names: list[str] = []
    # diff base: the epoch-0 replica starts from the canonical
    # transcripts schema, exactly like a fresh upstream lake
    prev_schema = (
        m_src.committed_schema(from_e) if from_e >= 0 else TRANSCRIPTS_SCHEMA
    )
    cur_schema = m_src.committed_schema(to_e)
    ddl_seg = _write_ddl_segment(
        out_dir, to_e, _schema_ddl_diff(prev_schema, cur_schema)
    )
    if ddl_seg:
        seg_names.append(ddl_seg)
    if plan:
        lineage = (
            ray.data.from_items(plan, override_num_blocks=len(plan))
            .map_batches(
                _SegmentConverter,
                fn_constructor_args=(
                    src_lake,
                    out_dir,
                    schema_to_json(cur_schema),
                ),
                batch_format="pyarrow",
                batch_size=4,
                concurrency=min(8, len(plan)),
            )
            .take_all()
        )
        seg_names.extend(r["segment"] for r in lineage)
    if not seg_names:
        return 0, 0  # e.g. a source repartition epoch: empty CDC delta
    reports = replay(
        ReplayConfig(
            changes_dir=out_dir,
            lake_dir=dst_lake,
            segments_per_epoch=None,  # ALL pending -> one dst epoch
            **replay_kwargs,
        )
    )
    return len(reports), len(seg_names)
