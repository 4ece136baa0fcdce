"""Incrementally-maintained DUPLICATE-CONTENT index over the committed
lake — "which live turns carry byte-identical text" without a full scan.

The third member of the incremental-index family (text postings:
pipelines/index.py; IVF vectors: pipelines/vecindex.py), with the same
manifest-fingerprint refresh rule: one hash-postings file per partition
RANGE (`<idx_dir>/r=NNNNN.parquet`, columns h/conv_id/turn_idx, sorted by
h), re-derived ONLY when the range's committed file set changed.
Tombstoned and purged rows vanish on the next refresh because postings
derive from the range's LIVE merge-read state.

Duplicate groups then come from ONE coarse hash-bucket shuffle over
id-only postings rows — text never moves, and the vectorized group-size
filter runs per bucket. The content hash is the shared 64-bit siphash
(functions/text.py:content_hash64); two distinct texts colliding would
need ~2^32 distinct texts per bucket (birthday bound) — the exact-text
oracle in the query catalog would catch it at test scale.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from datax_ray.pipelines.mv import _fingerprint, _load_state, _save_state

DUP_POSTINGS_SCHEMA = pa.schema(
    [
        ("h", pa.uint64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


class _RangeHasher:
    """map_batches stage over (range_id, files) rows: merge-read the
    range's live state, content-hash `text`, write the range's hash
    postings sorted by h (tmp+rename — idempotent retries)."""

    def __init__(self, lake_dir: str, idx_dir: str, schema_json):
        self.__name__ = "_RangeHasher"
        self.lake_dir = lake_dir
        self.idx_dir = idx_dir
        self.schema_json = schema_json

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from datax_ray.functions.text import content_hash64
        from datax_ray.sinks.lake import _merge_read_range

        out_rows = []
        for rid, files_json in zip(
            t["range_id"].to_pylist(), t["files"].to_pylist()
        ):
            live = _merge_read_range(
                self.lake_dir, json.loads(files_json), self.schema_json, False
            )
            h = content_hash64(
                pc.fill_null(live["text"], "").to_numpy(zero_copy_only=False)
            )
            postings = pa.table(
                {
                    "h": pa.array(h),
                    "conv_id": live["conv_id"],
                    "turn_idx": pc.cast(live["turn_idx"], pa.int32()),
                }
            ).cast(DUP_POSTINGS_SCHEMA)
            postings = postings.take(pc.sort_indices(postings["h"]))
            from datax_ray.state.fs import put_parquet

            put_parquet(postings, os.path.join(self.idx_dir, f"r={rid:05d}.parquet"),
                        compression="zstd", compression_level=1,
                        row_group_size=16384)
            out_rows.append((int(rid), postings.num_rows))
        return pa.table(
            {
                "range_id": pa.array([r for r, _ in out_rows], pa.int64()),
                "rows": pa.array([n for _, n in out_rows], pa.int64()),
            }
        )


def refresh_dedup_index(lake_dir: str, idx_dir: str) -> dict:
    """Bring the duplicate-content index up to the lake's committed state;
    only changed ranges are re-hashed. Returns {"refreshed", "skipped",
    "removed"}."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import _range_plan, lake_schema
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    parts = _range_plan(lake_dir, m)
    state = _load_state(idx_dir)
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(idx_dir):
        os.makedirs(idx_dir, exist_ok=True)

    todo, skipped = [], 0
    new_state: dict[str, str] = {}
    for p in parts:
        rid = int(p["range_id"])
        fp = _fingerprint(p["files"])
        new_state[str(rid)] = fp
        from datax_ray.state.fs import fs_for as _ffe

        if state.get(str(rid)) == fp and _ffe(idx_dir).exists(
            os.path.join(idx_dir, f"r={rid:05d}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"range_id": rid, "files": json.dumps(p["files"])})

    removed = 0
    live_rids = {int(p["range_id"]) for p in parts}
    from datax_ray.state.fs import fs_for as _ffc

    for path in _ffc(idx_dir).list_prefix(idx_dir):
        name = os.path.basename(path)
        if not (name.startswith("r=") and name.endswith(".parquet")):
            continue
        rid = int(name[2:-8])
        if rid not in live_rids:
            _ffc(idx_dir).delete(path)
            removed += 1

    if todo:
        schema_json = schema_to_json(lake_schema(lake_dir))
        ray.data.from_items(todo).map_batches(
            _RangeHasher(lake_dir, idx_dir, schema_json),
            batch_size=1,  # one range per task: the merge-read is the work
            batch_format="pyarrow",
        ).take_all()  # O(ranges) stat rows only
    _save_state(idx_dir, new_state)
    return {"refreshed": len(todo), "skipped": skipped, "removed": removed}


def duplicate_groups(
    idx_dir: str, min_count: int = 2, num_buckets: int = 64
) -> ray.data.Dataset:
    """All live turns whose text is byte-identical to >= min_count-1
    others: (conv_id, turn_idx, grp_size). One id-only coarse-bucket
    shuffle; the per-bucket group-size fold is a vectorized sorted-run
    count (all rows of a hash co-locate by construction)."""
    from datax_ray.state.fs import fs_for as _ffl

    files = sorted(
        p for p in _ffl(idx_dir).list_prefix(idx_dir)
        if os.path.basename(p).startswith("r=") and p.endswith(".parquet")
    )
    out_schema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("grp_size", pa.int64())]
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    def tag(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_grp", pa.array((h % np.uint64(num_buckets)).astype("int32"))
        )

    def fold(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t["h"]))
        h = t["h"].to_numpy(zero_copy_only=False)
        n = len(h)
        if n == 0:
            return out_schema.empty_table()
        change = np.r_[True, h[1:] != h[:-1]]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, n])
        grp_size = np.repeat(sizes, sizes)
        keep = pa.array(grp_size >= min_count)
        return pa.table(
            {
                "conv_id": t["conv_id"].filter(keep),
                "turn_idx": t["turn_idx"].filter(keep),
                "grp_size": pa.array(grp_size[grp_size >= min_count]),
            }
        ).cast(out_schema)

    from datax_ray.state.fs import read_parquet_dataset

    return (
        read_parquet_dataset(files, out_schema)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(fold, batch_format="pyarrow")
        .union(ray.data.from_arrow(out_schema.empty_table()))
    )


# --------------------------------------------------------------- near-dups --

NEAR_POSTINGS_SCHEMA = pa.schema(
    [
        ("g", pa.uint64()),     # word-k-gram shingle hash
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("n", pa.int32()),      # the turn's distinct-shingle count
    ]
)


class _RangeShingler:
    """map_batches stage over (range_id, files) rows: merge-read the
    range's LIVE state, shingle every turn's text (batched kernel —
    functions/dedup._shingles_batch), write the range's (g, conv, turn, n)
    postings sorted by g. Content derives only from committed files ⇒
    retries rewrite identical postings."""

    def __init__(self, lake_dir: str, idx_dir: str, schema_json, shingle_k: int):
        self.__name__ = "_RangeShingler"
        self.lake_dir = lake_dir
        self.idx_dir = idx_dir
        self.schema_json = schema_json
        self.k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from datax_ray.functions.dedup import _shingles_batch
        from datax_ray.sinks.lake import _merge_read_range

        out_rows = []
        for rid, files_json in zip(
            t["range_id"].to_pylist(), t["files"].to_pylist()
        ):
            live = _merge_read_range(
                self.lake_dir, json.loads(files_json), self.schema_json, False
            )
            texts = pc.fill_null(live["text"], "").to_pylist()
            gh, parent = _shingles_batch(texts, self.k)
            # per-turn DISTINCT shingles (jaccard is over shingle SETS)
            if len(gh):
                order = np.lexsort((gh, parent))
                gh, parent = gh[order], parent[order]
                keep = np.r_[True, (gh[1:] != gh[:-1]) | (parent[1:] != parent[:-1])]
                gh, parent = gh[keep], parent[keep]
            counts = np.bincount(parent, minlength=live.num_rows) if len(gh) else np.zeros(live.num_rows, np.int64)
            take = pa.array(parent, pa.int64())
            postings = pa.table(
                {
                    "g": pa.array(gh),
                    "conv_id": live["conv_id"].combine_chunks().take(take),
                    "turn_idx": pc.cast(
                        live["turn_idx"].combine_chunks().take(take), pa.int32()
                    ),
                    "n": pa.array(counts[parent].astype(np.int32), pa.int32()),
                }
            ).cast(NEAR_POSTINGS_SCHEMA)
            postings = postings.take(pc.sort_indices(postings["g"]))
            from datax_ray.state.fs import put_parquet

            put_parquet(postings,
                        os.path.join(self.idx_dir, f"n={rid:05d}.parquet"),
                        compression="zstd", compression_level=1)
            out_rows.append((int(rid), postings.num_rows))
        return pa.table(
            {
                "range_id": pa.array([r for r, _ in out_rows], pa.int64()),
                "postings": pa.array([c for _, c in out_rows], pa.int64()),
            }
        )


def refresh_neardup_index(lake_dir: str, idx_dir: str, shingle_k: int = 3) -> dict:
    """Bring the NEAR-duplicate shingle index up to the lake's committed
    state (manifest-fingerprint skip, like the exact-hash index)."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import _range_plan, lake_schema
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    parts = _range_plan(lake_dir, m)
    state = _load_state(idx_dir)
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(idx_dir):
        os.makedirs(idx_dir, exist_ok=True)

    todo, skipped = [], 0
    new_state: dict[str, str] = {}
    for p in parts:
        rid = int(p["range_id"])
        fp = _fingerprint(p["files"]) + f":k={shingle_k}"
        new_state[str(rid)] = fp
        from datax_ray.state.fs import fs_for as _ffe

        if state.get(str(rid)) == fp and _ffe(idx_dir).exists(
            os.path.join(idx_dir, f"n={rid:05d}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"range_id": rid, "files": json.dumps(p["files"])})

    removed = 0
    live_rids = {int(p["range_id"]) for p in parts}
    from datax_ray.state.fs import fs_for as _ffc

    for path in _ffc(idx_dir).list_prefix(idx_dir):
        name = os.path.basename(path)
        if not (name.startswith("n=") and name.endswith(".parquet")):
            continue
        rid = int(name[2:-8])
        if rid not in live_rids:
            _ffc(idx_dir).delete(path)
            removed += 1

    if todo:
        schema_json = schema_to_json(lake_schema(lake_dir))
        ray.data.from_items(todo).map_batches(
            _RangeShingler(lake_dir, idx_dir, schema_json, shingle_k),
            batch_size=1,
            batch_format="pyarrow",
        ).take_all()  # O(ranges) stat rows only
    _save_state(idx_dir, new_state)
    return {"refreshed": len(todo), "skipped": skipped, "removed": removed}


def near_duplicate_pairs(
    idx_dir: str, threshold: float = 0.5, num_buckets: int = 64
) -> ray.data.Dataset:
    """EXACT all-pairs word-k-gram Jaccard over the indexed lake state
    (the incremental-index twin of functions/dedup.ngram_pairs_exact —
    same AllPairs plan, but step 1 reads the persisted postings instead of
    shingling the corpus): per shingle-bucket, pair partials pre-counted;
    per pair-bucket, shared counts summed; jacc_milli = 1000·c // union
    (integer-exact, oracle-hashable). Emission volume is Σ_g df(g)²;
    df-skewed corpora need the LSH operator path — this index's contract
    is exactness over the LIVE lake (tombstoned/purged turns drop on
    refresh)."""
    out_schema = pa.schema(
        [
            ("conv_a", pa.string()), ("turn_a", pa.int32()),
            ("conv_b", pa.string()), ("turn_b", pa.int32()),
            ("jacc_milli", pa.int64()),
        ]
    )
    from datax_ray.state.fs import fs_for as _ffl

    files = sorted(
        p for p in _ffl(idx_dir).list_prefix(idx_dir)
        if os.path.basename(p).startswith("n=") and p.endswith(".parquet")
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    def tag(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_grp", pa.array((g % np.uint64(num_buckets)).astype("int32"))
        )

    pair_schema = pa.schema(
        [
            ("conv_a", pa.string()), ("turn_a", pa.int32()), ("na", pa.int32()),
            ("conv_b", pa.string()), ("turn_b", pa.int32()), ("nb", pa.int32()),
            ("c", pa.int64()), ("_pg", pa.int32()),
        ]
    )

    def emit_pairs(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["g", "conv_id", "turn_idx", "n"]).to_pandas()
        # lexicographic (conv, turn) order makes pair orientation a<b
        # consistent with the oracle's row-tuple comparison
        df = df.sort_values(["g", "conv_id", "turn_idx"], kind="stable")
        outs = {k: [] for k in ("ca", "ta", "na", "cb", "tb", "nb")}
        for _, s in df.groupby("g", sort=False):
            d = len(s)
            if d < 2:
                continue
            conv = s["conv_id"].to_numpy()
            turn = s["turn_idx"].to_numpy()
            n = s["n"].to_numpy()
            ia, ib = np.triu_indices(d, k=1)
            outs["ca"].append(conv[ia]); outs["ta"].append(turn[ia]); outs["na"].append(n[ia])
            outs["cb"].append(conv[ib]); outs["tb"].append(turn[ib]); outs["nb"].append(n[ib])
        if not outs["ca"]:
            return pair_schema.empty_table()
        pdf = pd.DataFrame(
            {
                "conv_a": np.concatenate(outs["ca"]), "turn_a": np.concatenate(outs["ta"]),
                "na": np.concatenate(outs["na"]),
                "conv_b": np.concatenate(outs["cb"]), "turn_b": np.concatenate(outs["tb"]),
                "nb": np.concatenate(outs["nb"]),
            }
        )
        # combiner: count shared shingles per pair within this bucket
        pdf = (
            pdf.groupby(
                ["conv_a", "turn_a", "na", "conv_b", "turn_b", "nb"],
                as_index=False,
            )
            .size()
            .rename(columns={"size": "c"})
        )
        with np.errstate(over="ignore"):
            h = (
                pd.util.hash_array(pdf["conv_a"].to_numpy(object), categorize=False)
                * np.uint64(0x9E3779B97F4A7C15)
                + pd.util.hash_array(pdf["conv_b"].to_numpy(object), categorize=False)
                + pdf["turn_a"].to_numpy().astype(np.uint64) * np.uint64(1000003)
                + pdf["turn_b"].to_numpy().astype(np.uint64)
            )
        pdf["_pg"] = (h % np.uint64(num_buckets)).astype("int32")
        return pa.Table.from_pandas(pdf, preserve_index=False).cast(pair_schema)

    min_milli = int(round(threshold * 1000))

    def reduce_pairs(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        agg = df.groupby(
            ["conv_a", "turn_a", "na", "conv_b", "turn_b", "nb"], as_index=False
        )["c"].sum()
        c = agg["c"].to_numpy().astype(np.int64)
        union = (
            agg["na"].to_numpy().astype(np.int64)
            + agg["nb"].to_numpy().astype(np.int64)
            - c
        )
        milli = np.where(union > 0, 1000 * c // np.maximum(union, 1), 0)
        agg["jacc_milli"] = milli
        agg = agg[agg["jacc_milli"] >= min_milli]
        return pa.Table.from_pandas(
            agg[["conv_a", "turn_a", "conv_b", "turn_b", "jacc_milli"]],
            preserve_index=False,
        ).cast(out_schema)

    from datax_ray.state.fs import read_parquet_dataset

    return (
        read_parquet_dataset(files, out_schema)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby("_pg")
        .map_groups(reduce_pairs, batch_format="pyarrow")
        .union(ray.data.from_arrow(out_schema.empty_table()))
    )
