"""Hash partitioning with hot-key salting (SURVEY.md §2B-B3).

part_id must be a PURE, process-stable function of (conv_id[, turn_idx],
config) — the lake's physical layout and every future epoch's routing depend
on recomputing it identically. We hash the *dictionary* of conv_id (unique
values per batch) rather than every row: CDC streams repeat conv_ids heavily,
so this is O(uniques) string hashing + an O(rows) integer gather.

Salting: when `salt_turn_width` W is set, part_id also mixes (turn_idx // W),
splitting a hot conv across partitions WITHOUT breaking merge locality —
merge state is keyed (conv_id, turn_idx), and all events for one key still
share one partition (BASELINE.json: "skew from hot conv_ids handled by
salted repartitioning before the merge-apply stage").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _stable_hash_strings(values: np.ndarray) -> np.ndarray:
    """Deterministic (cross-process, cross-run) uint64 hash of strings."""
    return pd.util.hash_array(values, categorize=False)


def part_ids_for(
    conv_id: pa.ChunkedArray | pa.Array,
    turn_idx: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    salt_turn_width: int | None = None,
) -> pa.Array:
    conv = conv_id.combine_chunks() if isinstance(conv_id, pa.ChunkedArray) else conv_id
    d = pc.dictionary_encode(conv)
    uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    codes = d.indices.to_numpy(zero_copy_only=False)
    h_uniq = _stable_hash_strings(uniq) if len(uniq) else np.empty(0, np.uint64)
    h = h_uniq[codes]
    if salt_turn_width:
        turns = (
            turn_idx.combine_chunks() if isinstance(turn_idx, pa.ChunkedArray) else turn_idx
        ).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = h + (turns // np.uint64(salt_turn_width)) * _SALT_MIX
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32))


def add_part_id(
    t: pa.Table, num_partitions: int, salt_turn_width: int | None = None
) -> pa.Table:
    pid = part_ids_for(t["conv_id"], t["turn_idx"], num_partitions, salt_turn_width)
    return t.append_column("part_id", pid)
