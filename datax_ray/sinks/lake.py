"""Lake read side.

The lake is `<lake>/p=NNNNN/e=EEEEEE.parquet` partition files plus the
`_manifest/` commit log. Readers trust ONLY files referenced by the latest
committed manifest — orphans from crashed epochs are invisible (SURVEY.md
§2B-B5). Partition files with mixed historical schemas (pre-/post-DDL) are
unified to the committed schema on read.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from datax_ray.schemas import DELETED_COL, INTERNAL_COLS, LAKE_SCHEMA
from datax_ray.state.manifest import Manifest
from datax_ray.state.schema_tracker import SchemaTracker


def lake_schema(lake_dir: str) -> pa.Schema:
    m = Manifest(lake_dir)
    return m.committed_schema() or LAKE_SCHEMA


def read_lake(lake_dir: str, *, include_internal: bool = False) -> ray.data.Dataset:
    """Committed lake state as a Dataset (live rows only unless asked)."""
    m = Manifest(lake_dir)
    schema = m.committed_schema() or LAKE_SCHEMA
    files = m.current_files()
    if not files:
        out_schema = schema if include_internal else pa.schema(
            [f for f in schema if f.name not in INTERNAL_COLS]
        )
        return ray.data.from_arrow(out_schema.empty_table())
    ds = ray.data.read_parquet(files)
    tracker = SchemaTracker(schema)

    def unify(t: pa.Table) -> pa.Table:
        t = tracker.unify(t)
        live = t.filter(pc.fill_null(pc.invert(t[DELETED_COL]), True))
        if include_internal:
            return live
        return live.drop_columns(list(INTERNAL_COLS))

    return ds.map_batches(unify, batch_format="pyarrow", zero_copy_batch=True)


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
