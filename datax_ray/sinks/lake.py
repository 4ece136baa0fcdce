"""Lake read side.

The lake is base+delta partition files (`<lake>/p=NNNNN/{b,d}=EEEEEE.parquet`)
plus the `_manifest/` commit log. Readers trust ONLY files referenced by the
latest committed manifest — orphans from crashed epochs are invisible
(SURVEY.md §2B-B5). Each read task LWW-merges one partition's base and
deltas (winner per (conv_id, turn_idx) = max (ts, _lsn)) and drops
tombstones, after unifying historical pre-DDL schemas to the committed one.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from datax_ray.schemas import DELETED_COL, INTERNAL_COLS, LAKE_SCHEMA
from datax_ray.state.manifest import Manifest
from datax_ray.state.schema_tracker import SchemaTracker


def lake_schema(lake_dir: str) -> pa.Schema:
    m = Manifest(lake_dir)
    return m.committed_schema() or LAKE_SCHEMA


def read_lake(lake_dir: str, *, include_internal: bool = False) -> ray.data.Dataset:
    """Committed lake state as a Dataset (live rows only unless asked):
    one merge-read task per partition, streaming — never materializes the
    lake on the driver."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.stages.merge import merge_states

    m = Manifest(lake_dir)
    schema = m.committed_schema() or LAKE_SCHEMA
    layout = m.committed_layout() or {}
    num_partitions = int(layout.get("num_partitions", 0) or 0)
    frag_ranges = int(layout.get("frag_ranges", 1) or 1)
    ppr = max(1, num_partitions // frag_ranges) if num_partitions else 1
    partitions = m.current_partitions()
    range_recs = m.current_ranges()
    parts = []
    all_rids = set(range_recs) | {pid // ppr for pid in partitions}
    for rid in sorted(all_rids):
        files = [
            partitions[p]["base"]
            for p in range(rid * ppr, (rid + 1) * ppr)
            if partitions.get(p, {}).get("base")
        ]
        files += list(range_recs.get(rid, {}).get("frags", []))
        if files:
            parts.append({"range_id": rid, "files": files})
    if not parts:
        out_schema = schema if include_internal else pa.schema(
            [f for f in schema if f.name not in INTERNAL_COLS]
        )
        return ray.data.from_arrow(out_schema.empty_table())

    schema_json = schema_to_json(schema)

    def load_partition(batch: pa.Table) -> pa.Table:
        from datax_ray.schemas import schema_from_json

        target = schema_from_json(schema_json)
        tracker = SchemaTracker(target)
        out = []
        for files in batch["files"].to_pylist():
            tables = [
                tracker.unify(pq.read_table(os.path.join(lake_dir, f)))
                for f in files
            ]
            state = merge_states(tables, target)
            live = state.filter(pc.fill_null(pc.invert(state[DELETED_COL]), True))
            out.append(live if include_internal else live.drop_columns(list(INTERNAL_COLS)))
        return pa.concat_tables(out)

    return ray.data.from_items(parts, override_num_blocks=len(parts)).map_batches(
        load_partition, batch_format="pyarrow", batch_size=None
    )


def final_table(lake_dir: str) -> pa.Table:
    """Materialized final state sorted by (conv_id, turn_idx) — the
    verification view (BASELINE.json: per-turn text equality under stable
    turn ordering). Only for test/small-scale use: materializes."""
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in read_lake(lake_dir).iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    ]
    schema = pa.schema(
        [f for f in lake_schema(lake_dir) if f.name not in INTERNAL_COLS]
    )
    if not batches:
        return schema.empty_table()
    t = pa.concat_tables(batches)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
