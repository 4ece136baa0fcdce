"""Fragment-delta sink + range compactor: the lake's exchange-free merge.

Measured on ray 2.49.2 (single node, 32 cpus, 8M rows): every Ray Data
all-to-all — sort-based or hash-based — burns a large constant (aggregator
actors busy-poll ~100 cpu-s per execution) plus ~8-25 us/row, versus
~2 us/row for the actual LWW+parquet kernels. A CDC lake does not need an
in-memory exchange at all: the lake IS storage, so the merge "shuffles
via storage", the way Hudi/Delta-style ingest does:

  * `DeltaWriter` (map-only, pipelined after normalize): LWW-reduces its
    batch, splits it by partition RANGE (`range_id = part_id // parts_per
    _range`), and appends one FRAGMENT parquet per range with a
    CONTENT-HASH filename — a retried task rewrites the identical file, so
    at-least-once execution stays exactly-once. Emits tiny lineage rows.
  * `Compactor` (map-only over ranges, every `compact_every` epochs per
    range): reads the range's per-partition bases + accumulated fragments,
    LWW-merges (tombstones kept — see stages/merge.py for why they must
    outlive compaction), and rewrites one base per partition.

Per-epoch cost is O(epoch events) with NO all-to-all; compaction is
amortized O(lake / compact_every) and embarrassingly parallel by range.

SIZING AT SCALE: a compaction task materializes ONE range (bases + frags)
in worker heap, so choose the frozen layout with
  num_partitions ≈ lake_bytes / ~256 MB   and   frag_ranges ≈ total cores,
keeping range size = lake/frag_ranges within a worker's memory; on a
256-node cluster that means thousands of partitions and a few thousand
ranges, not this sandbox's 128/32 defaults.
Every stage is a task-pool `map_batches` over Arrow — scaling is linear in
cores because nothing synchronizes except the (O(ranges)) driver commit.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.schemas import schema_from_json
from datax_ray.stages.merge import apply_events, merge_states
from datax_ray.state.fs import fs_for
from datax_ray.state.metrics import get_metrics_actor

FRAG_LINEAGE_SCHEMA = pa.schema(
    [
        ("range_id", pa.int32()),
        ("epoch", pa.int32()),
        ("kind", pa.string()),  # "frag"
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("events_applied", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("bytes", pa.int64()),
        ("ts_lo", pa.int64()),  # min/max event-time (µs) in the file —
        ("ts_hi", pa.int64()),  # the manifest's data-skipping statistics
        ("turn_lo", pa.int64()),  # min/max turn_idx — lets point lookups
        ("turn_hi", pa.int64()),  # enumerate salt values on salted layouts
        ("key_bloom", pa.string()),  # base64 Bloom over the file's distinct
        # conv_ids (state/bloom.py) — point lookups drop whole files from
        # the plan without a storage read; None = never pruned
    ]
)

BASE_LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("range_id", pa.int32()),
        ("epoch", pa.int32()),
        ("kind", pa.string()),  # "base"
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("bytes", pa.int64()),
        ("ts_lo", pa.int64()),
        ("ts_hi", pa.int64()),
        ("turn_lo", pa.int64()),
        ("turn_hi", pa.int64()),
        ("key_bloom", pa.string()),
    ]
)


def _turn_bounds(piece: pa.Table) -> tuple[int | None, int | None]:
    """(min, max) of turn_idx — folded into the manifest so salted-layout
    point lookups can enumerate the salt values (turn // W) that can exist
    and prune the range plan (sinks/lake.py:_lookup_rids)."""
    if "turn_idx" not in piece.column_names or piece.num_rows == 0:
        return None, None
    mm = pc.min_max(pc.cast(piece["turn_idx"], pa.int64()))
    return mm["min"].as_py(), mm["max"].as_py()


def _key_bloom(piece: pa.Table) -> str | None:
    """base64 Bloom over the file's distinct conv_ids (state/bloom.py) —
    manifest-resident file-level pruning for point lookups. Deterministic,
    so retried tasks still emit identical lineage rows."""
    if "conv_id" not in piece.column_names or piece.num_rows == 0:
        return None
    from datax_ray.state.bloom import bloom_of_keys

    return bloom_of_keys(piece["conv_id"])


def _ts_bounds(piece: pa.Table) -> tuple[int | None, int | None]:
    """(min, max) of the `ts` column as µs ints (None when absent/all-null)
    — recorded per file in the manifest so time-slice reads can prune
    whole files without opening them (sinks/lake.py `min_ts`)."""
    if "ts" not in piece.column_names or piece.num_rows == 0:
        return None, None
    mm = pc.min_max(pc.cast(piece["ts"], pa.int64()))
    return mm["min"].as_py(), mm["max"].as_py()


def write_fragment(
    piece: pa.Table, lake_dir: str, rid: int, epoch: int
) -> dict:
    """Write one fragment parquet with the engine's atomicity/naming
    discipline — zstd-1 bytes, CONTENT-HASH filename (sha1[:16] of the
    exact file bytes, so a retried task rewrites the identical file and
    `fsck --deep` can re-verify it), atomic full-object put (state/fs.py:
    tmp+replace on POSIX, conditional-free PUT on an object store — the
    content-hash name makes overwrite idempotent) — and return its
    FRAG_LINEAGE_SCHEMA row (events_applied left equal to rows; callers
    that track it separately overwrite it). ALL fragment writers
    (DeltaWriter, PurgeTombstoner, RepartitionWriter) must go through
    here: exactly-once and deep fsck depend on every fragment sharing one
    digest/compression scheme."""
    sink = pa.BufferOutputStream()
    pq.write_table(
        piece, sink, compression="zstd", compression_level=1,
        row_group_size=ROW_GROUP_ROWS,
        use_dictionary=_dict_cols(piece.schema),
    )
    buf = sink.getvalue()
    # pa.Buffer exposes the buffer protocol: hash and write it directly —
    # to_pybytes() here would copy every lake byte twice more, a measurable
    # cost when the lake write path is memory-bandwidth-bound.
    digest = hashlib.sha1(buf).hexdigest()[:16]
    rel = os.path.join(f"r={rid:04d}", f"e={epoch:06d}-{digest}.parquet")
    fs_for(lake_dir).put(os.path.join(lake_dir, rel), buf)
    lsn_hi = pc.max(piece["_lsn"]).as_py()
    ts_lo, ts_hi = _ts_bounds(piece)
    turn_lo, turn_hi = _turn_bounds(piece)
    return {
        "range_id": rid,
        "epoch": epoch,
        "kind": "frag",
        "file": rel,
        "rows": piece.num_rows,
        "events_applied": piece.num_rows,
        "lsn_hi": int(lsn_hi if lsn_hi is not None else -1),
        "bytes": len(buf),
        "ts_lo": ts_lo,
        "ts_hi": ts_hi,
        "turn_lo": turn_lo,
        "turn_hi": turn_hi,
        "key_bloom": _key_bloom(piece),
    }


# Bases/fragments are sorted by (conv_id, turn_idx); bounded row groups
# give parquet conv_id min/max statistics per group, which the read path
# pushes point-lookup filters against (sinks/lake.py:_merge_read_range) —
# a 1M-row compacted base then decompresses ~1/16 of its bytes for one key.
ROW_GROUP_ROWS = 65536


def _dict_cols(schema: pa.Schema) -> list[str]:
    """Columns worth a parquet dictionary page: string columns EXCEPT the
    wide free-text payload. conv_id/role/tool repeat heavily (dictionary
    shrinks + speeds the write); unique transcript text makes its
    dictionary pure overhead — measured 19% fewer bytes AND ~19% faster
    writes at 500k rows vs dictionary-everything, with zstd-1 unchanged.
    Bytes written per event is the DRAM-bound resource at full-node
    concurrency (BASELINE.md membw analysis), so this is a scaling lever,
    not just disk savings."""
    import pyarrow.types as pt

    return [
        f.name
        for f in schema
        if (pt.is_string(f.type) or pt.is_large_string(f.type))
        and f.name != "text"
    ]


def _atomic_write(table: pa.Table, path: str) -> int:
    sink = pa.BufferOutputStream()
    pq.write_table(
        table, sink, compression="zstd", compression_level=1,
        row_group_size=ROW_GROUP_ROWS,
        use_dictionary=_dict_cols(table.schema),
    )
    buf = sink.getvalue()
    fs_for(path).put(path, buf)
    return len(buf)


class DeltaWriter:
    """Map-only fragment sink: one call = one normalized batch in, tiny
    lineage rows out. The batch's LWW winners (incl. tombstones, with their
    part_id) land in `<lake>/r=RR/e=EEEEEE-<contenthash>.parquet`."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        num_partitions: int,
        frag_ranges: int,
        lake_schema_json: list[list[str]],
        metrics: bool = True,
    ):
        self.__name__ = "DeltaWriter"
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.parts_per_range = max(1, num_partitions // frag_ranges)
        self.schema = schema_from_json(lake_schema_json)
        self._metrics = get_metrics_actor() if metrics else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return FRAG_LINEAGE_SCHEMA.empty_table()
        events_in = batch.num_rows
        # Within-batch LWW combiner (dedups re-delivered rows, shrinks
        # frags); part_id rides along inside the projected schema AND leads
        # the sort keys, so the single lww sort also groups rows by range —
        # no second sort/take pass (these copies are the memory-bandwidth
        # hot spot at full-node concurrency).
        schema_with_part = pa.schema(
            [*self.schema, pa.field("part_id", pa.int32())],
            metadata=self.schema.metadata,  # keep the rename map
        )
        delta = apply_events(
            None, batch, schema_with_part, key_cols=("part_id", "conv_id", "turn_idx")
        )

        if delta.num_rows == 0:
            return FRAG_LINEAGE_SCHEMA.empty_table()
        rid_sorted = (
            delta["part_id"].to_numpy(zero_copy_only=False) // self.parts_per_range
        ).astype(np.int32)
        bounds = np.flatnonzero(np.r_[True, rid_sorted[1:] != rid_sorted[:-1]])
        bounds = np.r_[bounds, len(rid_sorted)]

        out_rows = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            rid = int(rid_sorted[lo])
            row = write_fragment(
                delta.slice(lo, hi - lo), self.lake_dir, rid, self.epoch
            )
            row["events_applied"] = hi - lo
            out_rows.append(row)
        if self._metrics is not None:
            self._metrics.add.remote(
                "delta_write",
                {
                    "events_in": events_in,
                    "rows_out": delta.num_rows,
                    "frags": len(out_rows),
                    "bytes_out": sum(r["bytes"] for r in out_rows),
                },
            )
        return pa.Table.from_pylist(out_rows, schema=FRAG_LINEAGE_SCHEMA)


class Compactor:
    """Map-only range compactor: one call = one range descriptor row in
    (base files + fragment files), per-partition base lineage rows out."""

    def __init__(self, lake_dir: str, epoch: int, lake_schema_json: list[list[str]],
                 metrics: bool = True, cluster_ts: bool = False):
        self.__name__ = "Compactor"
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema = schema_from_json(lake_schema_json)
        self._metrics = get_metrics_actor() if metrics else None
        # cluster_ts: write bases sorted by (ts, conv_id, turn_idx) so row
        # groups carry tight monotone ts stats — read_lake(min_ts=)'s
        # pushed filter then skips row groups before decompression. The
        # merge fold sorts its inputs itself, so order is a pure layout
        # choice (see compact_lake docstring for the ZORDER trade-off).
        self.cluster_ts = cluster_ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for item in batch.to_pylist():
            rid = int(item["range_id"])
            schema_with_part = pa.schema(
                [*self.schema, pa.field("part_id", pa.int32())],
                metadata=self.schema.metadata,  # keep the rename map —
                # pre-rename fragments/bases remap instead of null-filling
            )
            fs = fs_for(self.lake_dir)
            tables = []
            for rel, pid in zip(item["base_files"], item["base_pids"]):
                t = pq.read_table(fs.open_input(os.path.join(self.lake_dir, rel)))
                t = t.append_column(
                    "part_id", pa.array(np.full(t.num_rows, pid, dtype=np.int32))
                )
                tables.append(t)
            for rel in item["frag_files"]:
                tables.append(
                    pq.read_table(fs.open_input(os.path.join(self.lake_dir, rel)))
                )
            # part_id leads the merge sort keys: output arrives grouped by
            # partition, sorted by (conv_id, turn_idx) within each.
            state = merge_states(
                tables, schema_with_part, key_cols=("part_id", "conv_id", "turn_idx")
            )

            if state.num_rows == 0:
                continue
            pid_sorted = state["part_id"].to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(np.r_[True, pid_sorted[1:] != pid_sorted[:-1]])
            bounds = np.r_[bounds, len(pid_sorted)]
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                pid = int(pid_sorted[lo])
                piece = state.slice(lo, hi - lo).drop_columns(["part_id"])
                if self.cluster_ts:
                    piece = piece.take(pc.sort_indices(piece, sort_keys=[
                        ("ts", "ascending"), ("conv_id", "ascending"),
                        ("turn_idx", "ascending"),
                    ]))
                rel = os.path.join(f"p={pid:05d}", f"b={self.epoch:06d}.parquet")
                nbytes = _atomic_write(piece, os.path.join(self.lake_dir, rel))
                lsn_hi = pc.max(piece["_lsn"]).as_py()
                ts_lo, ts_hi = _ts_bounds(piece)
                turn_lo, turn_hi = _turn_bounds(piece)
                out_rows.append(
                    {
                        "part_id": pid,
                        "range_id": rid,
                        "epoch": self.epoch,
                        "kind": "base",
                        "file": rel,
                        "rows": hi - lo,
                        "lsn_hi": int(lsn_hi if lsn_hi is not None else -1),
                        "bytes": nbytes,
                        "ts_lo": ts_lo,
                        "ts_hi": ts_hi,
                        "turn_lo": turn_lo,
                        "turn_hi": turn_hi,
                        "key_bloom": _key_bloom(piece),
                    }
                )
            if self._metrics is not None:
                self._metrics.add.remote(
                    "compact",
                    {
                        "ranges": 1,
                        "rows_out": state.num_rows,
                        "files_in": len(tables),
                    },
                )
        return pa.Table.from_pylist(out_rows, schema=BASE_LINEAGE_SCHEMA)
