"""Normalize / validate / route-dirty / partition — the single stateless
pre-shuffle pass (SURVEY.md §2B-B2, B3, B7; DataX transformer + dirty-record
semantics, §2A rows 17/20).

One `map_batches(Normalizer, batch_format="pyarrow", zero_copy_batch=True)`
does, per Arrow batch:
  1. watermark filter: drop events with lsn <= committed watermark (exact
     dedup of replayed events, B7);
  2. drop op="ddl" rows (folded into the SchemaTracker driver-side);
  3. validity split: dirty rows get a reason and are written to the
     dead-letter parquet sink with a CONTENT-HASH filename — a retried task
     rewrites the identical file, keeping the side channel idempotent;
  4. cast payload columns to the epoch's target schema (widen casts);
  5. append part_id (salted hash of conv_id) for the merge shuffle.

Instantiated once per actor when used with `concurrency=` (the config is
read-only); per-batch work is all pyarrow/numpy kernels.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import renames_of, resolve_source_name, schema_from_json
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.metrics import get_metrics_actor
from datax_ray.validation import (
    compile_expectations,
    dirty_reason,
    valid_event_mask,
)


class Normalizer:
    def __init__(
        self,
        target_schema_json: list[list[str]],
        num_partitions: int,
        watermark_lsn: int = -1,
        salt_turn_width: int | None = None,
        deadletter_dir: str | None = None,
        metrics: bool = True,
        max_events_per_sec: float | None = None,
        expectations: list[dict] | None = None,
    ):
        self.__name__ = "Normalizer"  # Ray Data names task UDFs from this
        self._check_expectations = (
            compile_expectations(expectations) if expectations else None
        )
        self.schema = schema_from_json(target_schema_json)
        self._renames = renames_of(self.schema)
        self.payload_cols = [f.name for f in self.schema if f.name != "_lsn"]
        self.num_partitions = num_partitions
        self.watermark_lsn = watermark_lsn
        self.salt_turn_width = salt_turn_width
        self.deadletter_dir = deadletter_dir
        self._metrics = get_metrics_actor() if metrics else None
        self._limiter = None
        if max_events_per_sec:
            from datax_ray.state.ratelimit import get_rate_limiter

            self._limiter = get_rate_limiter(max_events_per_sec)

    def _spill_dirty(self, dirty: pa.Table, reasons=None) -> None:
        if self.deadletter_dir is None or dirty.num_rows == 0:
            return
        validity = dirty_reason(dirty)
        if reasons is not None:
            # validity reason wins (a malformed row is dirty regardless of
            # expectations); expectation reason fills the rest
            validity = pc.coalesce(validity, reasons)
        dirty = dirty.append_column("reason", validity)
        import pyarrow.parquet as pq

        from datax_ray.state.fs import fs_for

        # Content-hash name => idempotent under task retry; atomic
        # full-object put (object-store-safe, state/fs.py).
        sink = pa.BufferOutputStream()
        pq.write_table(dirty, sink, compression="zstd", compression_level=1)
        buf = sink.getvalue()
        name = hashlib.sha1(buf).hexdigest()[:16]
        path = os.path.join(self.deadletter_dir, f"dl-{name}.parquet")
        fs_for(path).put(path, buf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_in = batch.num_rows
        if self._limiter is not None and rows_in:
            import time as _time

            import ray as _ray

            wait = _ray.get(self._limiter.acquire.remote(rows_in))
            if wait > 0:
                _time.sleep(wait)
        if self.watermark_lsn >= 0:
            batch = batch.filter(
                pc.fill_null(pc.greater(batch["lsn"], self.watermark_lsn), False)
            )
        not_ddl = pc.fill_null(pc.not_equal(batch["op"], "ddl"), True)
        batch = batch.filter(not_ddl)

        mask = valid_event_mask(batch)
        exp_reason = None
        if self._check_expectations is not None:
            exp_mask, exp_reason = self._check_expectations(batch)
            mask = pc.and_kleene(mask, exp_mask)
        bad = pc.invert(mask)
        dirty = batch.filter(bad)
        good = batch.filter(mask)
        self._spill_dirty(
            dirty, exp_reason.filter(bad) if exp_reason is not None else None
        )

        # Project to [lsn, op] + payload columns, casting to the target types.
        cols: dict[str, pa.ChunkedArray | pa.Array] = {
            "lsn": good["lsn"],
            "op": good["op"],
        }
        for name in self.payload_cols:
            want = self.schema.field(name).type
            # renamed columns: change events keep the ORIGINAL stream name
            # (the source system doesn't know about lake-side renames), so
            # resolve through the schema's rename metadata
            src = resolve_source_name(good.schema, name, self._renames)
            if src is None:
                cols[name] = pa.nulls(good.num_rows, want)
            else:
                col = good[src]
                cols[name] = pc.cast(col, want) if col.type != want else col
        out = pa.table(cols)
        out = out.append_column(
            "part_id",
            part_ids_for(
                out["conv_id"], out["turn_idx"], self.num_partitions, self.salt_turn_width
            ),
        )
        if self._metrics is not None:
            nbytes = batch.nbytes
            self._metrics.add.remote(
                "normalize",
                {
                    "rows_in": rows_in,
                    "rows_out": out.num_rows,
                    "dirty_rows": dirty.num_rows,
                    "bytes_in": nbytes,
                },
            )
        return out
