"""Incrementally-maintained secondary INVERTED INDEX over the committed
lake — "search the lake by token" without a full scan.

The same manifest-fingerprint incrementality as the materialized view
(pipelines/mv.py): postings are stored per partition RANGE
(`<idx_dir>/r=NNNNN.parquet`, columns term/conv_id/turn_idx), and a range
is re-tokenized ONLY when its committed file set changed since the last
refresh — the fingerprint comes from the manifest, so untouched ranges
cost zero storage reads. Tombstoned and purged rows vanish from the index
on the next refresh because the postings derive from the range's LIVE
merge-read state.

Each range's postings file is written SORTED BY TERM, so a search prunes
at two levels before touching data:
  1. parquet row-group statistics on `term` skip non-overlapping row
     groups inside each range file (pyarrow dataset filter pushdown);
  2. the per-range layout keeps search embarrassingly parallel — one read
     task per range, no shuffle; a probe moves O(matching postings).

This is the engine's "shared index" capability expressed WITHOUT a shared
mutable actor: the index is just more range-partitioned parquet + the
manifest fingerprint, so it inherits atomicity (atomic full-object put per
range through the state/fs.py storage contract), idempotent retries, and
crash-resume for free — the same reasons the lake itself needs no
coordination service. Like the lake and the MV family, the index directory
may live on an object store (`obj://...`, `s3://...`): every read/write/
list/delete below goes through `state/fs.py`, never raw POSIX.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from datax_ray.pipelines.mv import _fingerprint, _load_state, _save_state

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


class _RangeIndexer:
    """map_batches stage over (range_id, files) rows: merge-read the
    range's live state, tokenize `text` on single spaces (the corpus
    convention shared with the DuckDB oracles' string_split), write the
    range's postings file sorted by term."""

    def __init__(self, lake_dir: str, idx_dir: str, schema_json):
        self.__name__ = "_RangeIndexer"
        self.lake_dir = lake_dir
        self.idx_dir = idx_dir
        self.schema_json = schema_json

    def __call__(self, t: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range
        from datax_ray.state.fs import put_parquet

        out_rows = []
        for rid, files_json in zip(
            t["range_id"].to_pylist(), t["files"].to_pylist()
        ):
            files = json.loads(files_json)
            live = _merge_read_range(
                self.lake_dir, files, self.schema_json, False
            )
            toks = pc.split_pattern(
                pc.fill_null(live["text"], ""), " "
            )
            n_per_row = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            )
            import numpy as np

            idx = np.repeat(np.arange(len(n_per_row)), n_per_row)
            flat = pc.list_flatten(toks)
            postings = pa.table(
                {
                    "term": flat,
                    "conv_id": live["conv_id"].take(pa.array(idx)),
                    "turn_idx": pc.cast(
                        live["turn_idx"].take(pa.array(idx)), pa.int32()
                    ),
                }
            )
            postings = postings.filter(pc.not_equal(postings["term"], ""))
            postings = (
                postings.group_by(["term", "conv_id", "turn_idx"])
                .aggregate([])
                .sort_by([("term", "ascending"), ("conv_id", "ascending"),
                          ("turn_idx", "ascending")])
                .cast(POSTINGS_SCHEMA)
            )
            put_parquet(
                postings,
                os.path.join(self.idx_dir, f"r={rid:05d}.parquet"),
                compression="zstd", compression_level=1,
                row_group_size=16384,
            )
            out_rows.append((int(rid), postings.num_rows))
        return pa.table(
            {
                "range_id": pa.array([r for r, _ in out_rows], pa.int64()),
                "postings": pa.array([n for _, n in out_rows], pa.int64()),
            }
        )


def refresh_index(lake_dir: str, idx_dir: str) -> dict:
    """Bring the inverted index up to the lake's committed state; only
    ranges whose committed file set changed are re-tokenized. Returns
    {"refreshed": n, "skipped": n, "removed": n}."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import _range_plan, lake_schema
    from datax_ray.state.fs import fs_for
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    parts = _range_plan(lake_dir, m)
    state = _load_state(idx_dir)
    fs = fs_for(idx_dir)

    todo, skipped = [], 0
    new_state: dict[str, str] = {}
    for p in parts:
        rid = int(p["range_id"])
        fp = _fingerprint(p["files"])
        new_state[str(rid)] = fp
        if state.get(str(rid)) == fp and fs.exists(
            os.path.join(idx_dir, f"r={rid:05d}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"range_id": rid, "files": json.dumps(p["files"])})

    # Store-scan cleanup (not state-dict): a crashed refresh can leave a
    # postings file never recorded in state; search lists the store, so a
    # stale orphan would keep serving purged/vanished rows forever.
    removed = 0
    live_rids = {int(p["range_id"]) for p in parts}
    for path in _postings_files(idx_dir):
        rid = int(os.path.basename(path)[2:-8])
        if rid not in live_rids:
            fs.delete(path)
            removed += 1

    if todo:
        schema_json = schema_to_json(lake_schema(lake_dir))
        ray.data.from_items(todo).map_batches(
            _RangeIndexer(lake_dir, idx_dir, schema_json),
            batch_size=1,  # one range per task: the merge-read is the work
            batch_format="pyarrow",
        ).take_all()  # O(ranges) stat rows only
    _save_state(idx_dir, new_state)
    return {"refreshed": len(todo), "skipped": skipped, "removed": removed}


def _postings_files(idx_dir: str) -> list[str]:
    """Live postings paths via the storage contract (works on obj://)."""
    from datax_ray.state.fs import fs_for

    return [
        p for p in fs_for(idx_dir).list_prefix(idx_dir)
        if os.path.basename(p).startswith("r=") and p.endswith(".parquet")
    ]


def search_index(
    idx_dir: str, terms: list[str], mode: str = "any"
) -> ray.data.Dataset:
    """Probe the index for `terms`. mode="any": postings rows
    (term, conv_id, turn_idx) for any query term. mode="all": turns
    containing ALL query terms (conv_id, turn_idx only) — the AND fold
    is a distinct-term count per turn, shuffled by coarse key hash,
    never the corpus. On local paths, row-group statistics on the
    term-sorted postings files prune non-matching row groups before
    decompression (filter pushdown); on remote schemes the filter runs
    per batch after the contract read (still one task per range file)."""
    from datax_ray.state.fs import is_remote, read_parquet_dataset

    files = _postings_files(idx_dir)
    if not files:
        if mode == "any":
            return ray.data.from_arrow(POSTINGS_SCHEMA.empty_table())
        return ray.data.from_arrow(
            pa.schema(
                [("conv_id", pa.string()), ("turn_idx", pa.int32())]
            ).empty_table()
        )
    if is_remote(files[0]):
        term_set = pa.array(sorted(set(terms)), pa.string())
        hits = read_parquet_dataset(files, POSTINGS_SCHEMA).map_batches(
            lambda t: t.filter(pc.is_in(t["term"], value_set=term_set)),
            batch_format="pyarrow",
        )
    else:
        hits = ray.data.read_parquet(
            files, filter=pc.field("term").isin(list(terms))
        )
    if mode == "any":
        return hits

    import pandas as pd

    from datax_ray.functions.relational import partial_agg

    want = len(set(terms))
    counts = partial_agg(
        hits, keys=["conv_id", "turn_idx"], counts="n_terms"
    )

    def keep_all(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_terms"] >= want][["conv_id", "turn_idx"]]

    return counts.map_batches(keep_all, batch_format="pandas")
