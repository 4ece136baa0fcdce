"""Hypothesis property tests for the core kernels: the vectorized paths
must agree with naive python references on ARBITRARY inputs, not just the
seeded fixtures — ties, duplicates, empty groups, adversarial orderings.

Kept Ray-free (pure pyarrow/numpy kernels) so examples run in
milliseconds and shrinking stays useful."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from datax_ray.stages.merge import lww_reduce, reduce_patch_partials, to_patch_partials
from datax_ray.stages.partitioning import part_ids_for

# one event: (conv 0-3, turn 0-2, ts 0-5, lsn 0-9, payload)
_events = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 2),
        st.integers(0, 5),
        st.integers(0, 9),
        st.integers(0, 99),
    ),
    min_size=0,
    max_size=40,
)


def _events_table(rows):
    return pa.table(
        {
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "lsn": pa.array([r[3] for r in rows], pa.int64()),
            "payload": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


@settings(max_examples=120, deadline=None)
@given(_events)
def test_lww_reduce_matches_naive_reference(rows):
    """Winner per key = max (ts, lsn); duplicated (key, ts, lsn) rows may
    pick either duplicate, so compare on the (ts, lsn) winners themselves
    plus the payload when the winning stamp is unique."""
    t = _events_table(rows)
    got = lww_reduce(t, key_cols=("conv_id", "turn_idx"), order_cols=("ts", "lsn"))

    ref: dict = {}
    stamps: dict = {}
    for r in rows:
        k = (f"c{r[0]}", r[1])
        stamp = (r[2], r[3])
        if k not in ref or stamp >= stamps[k]:
            # on exact stamp ties any of the tied rows may win
            if k in ref and stamp == stamps[k]:
                ref[k].add(r[4])
            else:
                ref[k] = {r[4]}
            stamps[k] = stamp

    assert got.num_rows == len(ref)
    for i in range(got.num_rows):
        k = (got["conv_id"][i].as_py(), got["turn_idx"][i].as_py())
        assert k in ref
        assert (
            got["ts"][i].value,
            got["lsn"][i].as_py(),
        ) == stamps[k]
        assert got["payload"][i].as_py() in ref[k]
    # winners are key-sorted (the delta writer relies on this)
    keys = list(
        zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist())
    )
    assert keys == sorted(keys)


@settings(max_examples=100, deadline=None)
@given(_events, st.integers(1, 2))
def test_lww_reduce_is_associative_over_splits(rows, cut_denom):
    """Reducing the whole table equals reducing two arbitrary halves and
    then reducing their concatenation — the property the fragment/compact
    /read paths rest on."""
    t = _events_table(rows)
    whole = lww_reduce(t, order_cols=("ts", "lsn"))
    cut = len(rows) // (cut_denom + 1)
    a = lww_reduce(t.slice(0, cut), order_cols=("ts", "lsn"))
    b = lww_reduce(t.slice(cut), order_cols=("ts", "lsn"))
    again = lww_reduce(pa.concat_tables([a, b]), order_cols=("ts", "lsn"))
    # compare winning stamps per key (payload can differ on exact-tie keys)
    def stamps(x):
        return {
            (c, ti): (ts, l)
            for c, ti, ts, l in zip(
                x["conv_id"].to_pylist(),
                x["turn_idx"].to_pylist(),
                [v.value for v in x["ts"]],
                x["lsn"].to_pylist(),
            )
        }

    assert stamps(again) == stamps(whole)


# patch events: value None = column NOT SET
_patches = st.lists(
    st.tuples(
        st.integers(0, 2),  # conv
        st.integers(0, 1),  # turn
        st.integers(0, 30),  # lsn (unique-ified below)
        st.one_of(st.none(), st.integers(0, 9)),  # role set?
        st.one_of(st.none(), st.integers(0, 9)),  # text set?
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=100, deadline=None)
@given(_patches, st.integers(0, 3))
def test_patch_merge_matches_reference_and_split_invariance(rows, cut):
    """Column-level LWW registers: final value per column = highest-lsn
    event that SET it; arbitrary split + re-reduce equals one-shot."""
    # unique lsns (the patch contract: lsn is the total order)
    rows = [
        (c, t, i, r, x) for i, (c, t, _, r, x) in enumerate(rows)
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "lsn": pa.array([r[2] for r in rows], pa.int64()),
            "role": pa.array(
                [None if r[3] is None else f"r{r[3]}" for r in rows], pa.string()
            ),
            "text": pa.array(
                [None if r[4] is None else f"t{r[4]}" for r in rows], pa.string()
            ),
        }
    )
    payload = ("role", "text")
    whole = reduce_patch_partials(
        to_patch_partials(tbl, payload), payload_cols=payload
    )

    ref: dict = {}
    for r in sorted(rows, key=lambda r: r[2]):
        k = (f"c{r[0]}", r[1])
        cur = ref.setdefault(k, {"role": None, "text": None})
        if r[3] is not None:
            cur["role"] = f"r{r[3]}"
        if r[4] is not None:
            cur["text"] = f"t{r[4]}"

    assert whole.num_rows == len(ref)
    for i in range(whole.num_rows):
        k = (whole["conv_id"][i].as_py(), whole["turn_idx"][i].as_py())
        assert whole["role"][i].as_py() == ref[k]["role"]
        assert whole["text"][i].as_py() == ref[k]["text"]

    # split invariance (combiner == reducer)
    n = tbl.num_rows
    lo = min(cut * n // 4, n)
    a = reduce_patch_partials(to_patch_partials(tbl.slice(0, lo), payload), payload_cols=payload)
    b = reduce_patch_partials(to_patch_partials(tbl.slice(lo), payload), payload_cols=payload)
    again = reduce_patch_partials(pa.concat_tables([a, b]), payload_cols=payload)
    assert again.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        whole.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=30),
    st.integers(1, 64),
    st.one_of(st.none(), st.integers(1, 8)),
)
def test_part_ids_stable_in_range_and_salt_local(convs, parts, salt_w):
    """part_ids_for: deterministic, in [0, parts), and salting never
    splits one (conv, turn-bucket) across partitions."""
    turn = pa.array([i % 7 for i in range(len(convs))], pa.int32())
    conv = pa.array(convs, pa.string())
    p1 = part_ids_for(conv, turn, parts, salt_w).to_pylist()
    p2 = part_ids_for(conv, turn, parts, salt_w).to_pylist()
    assert p1 == p2
    assert all(0 <= p < parts for p in p1)
    seen: dict = {}
    for c, t, p in zip(convs, turn.to_pylist(), p1):
        bucket = t // salt_w if salt_w else 0
        k = (c, bucket)
        assert seen.setdefault(k, p) == p


# ---- grouped head-N kernel vs a naive reference ----------------------------

_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50), st.integers(0, 9)),
    min_size=0,
    max_size=60,
)


@settings(max_examples=120, deadline=None)
@given(_rows, st.integers(1, 4))
def test_head_n_per_key_matches_naive(rows, n):
    """_head_n_per_key == per-key 'sort by (val desc, tie asc), take n'
    with a FULL deterministic order (tie column unique-ified), so the
    vectorized rank-within-group mask is checked row-for-row."""
    from datax_ray.functions.relational import _head_n_per_key

    rows = [(k, v, i) for i, (k, v, _) in enumerate(rows)]  # unique tie col
    t = pa.table(
        {
            "k": pa.array([f"k{r[0]}" for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
            "tie": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = _head_n_per_key(
        t, keys=["k"], sort_cols=["k", "v", "tie"],
        asc=[True, False, True], n=n,
    )

    ref: dict = {}
    for k, v, tie in rows:
        ref.setdefault(f"k{k}", []).append((-v, tie))
    expect = sorted(
        (k, -nv, tie)
        for k, lst in ref.items()
        for nv, tie in sorted(lst)[:n]
    )
    got_rows = sorted(
        zip(got["k"].to_pylist(), got["v"].to_pylist(), got["tie"].to_pylist())
    )
    assert got_rows == expect


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.text(max_size=8)), min_size=0, max_size=30),
    st.integers(2, 64),
)
def test_content_hash_and_buckets_deterministic(texts, buckets):
    """content_hash64: equal strings hash equal, None -> 0, process-stable
    re-evaluation; key_buckets: in range and invariant across calls."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.functions.text import content_hash64

    h1, h2 = content_hash64(texts), content_hash64(texts)
    assert (h1 == h2).all()
    for i, a in enumerate(texts):
        if a is None:
            assert h1[i] == 0
        for j, b in enumerate(texts):
            if a == b and a is not None:
                assert h1[i] == h1[j]

    t = pa.table({"x": pa.array([x or "" for x in texts], pa.string())})
    b1 = key_buckets(t, ["x"], buckets).to_pylist()
    b2 = key_buckets(t, ["x"], buckets).to_pylist()
    assert b1 == b2
    assert all(0 <= b < buckets for b in b1)


# ---- session-window kernel (pipelines/mvsession._sessionize_table) ----

_turns = st.lists(
    st.tuples(
        st.integers(0, 3),        # conv
        st.integers(0, 40),       # ts (µs — gaps split at > gap_us)
        st.integers(0, 9),        # text length
    ),
    min_size=0,
    max_size=50,
)


@given(_turns, st.integers(1, 8))
@settings(max_examples=120, deadline=None)
def test_sessionize_table_matches_naive(rows, gap_us):
    from datax_ray.pipelines.mvsession import _sessionize_table

    t = pa.table(
        {
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array(["x" * r[2] for r in rows], pa.string()),
        }
    )
    got = _sessionize_table(t, gap_us).to_pylist()
    got = sorted(
        (r["conv_id"], r["session_idx"], r["start_ts"].timestamp() * 1e6,
         r["end_ts"].timestamp() * 1e6, r["n_turns"], r["sum_chars"])
        for r in got
    )

    # naive reference
    byconv: dict = {}
    for c, ts, ln in sorted(rows):
        byconv.setdefault(f"c{c}", []).append((ts, ln))
    want = []
    for conv, evs in byconv.items():
        sid = -1
        prev = None
        cur = None
        for ts, ln in evs:
            if prev is None or ts - prev > gap_us:
                if cur:
                    want.append(cur)
                sid += 1
                cur = [conv, sid, ts, ts, 0, 0]
            cur[3] = ts
            cur[4] += 1
            cur[5] += ln
            prev = ts
        if cur:
            want.append(cur)
    want = sorted(
        (c, s, float(a), float(b), n, ch) for c, s, a, b, n, ch in want
    )
    assert got == want


# ---- as-of kernel (pipelines/mvasof._asof_table) ----

@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
             min_size=0, max_size=25),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
             min_size=0, max_size=25),
)
@settings(max_examples=120, deadline=None)
def test_asof_table_matches_naive(lrows, rrows):
    from datax_ray.pipelines.mvasof import _asof_table

    # right rows unique per (conv, ts) — the kernel's documented contract
    rrows = sorted(set(rrows))
    left = pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c, _ in lrows], pa.string()),
            "turn_idx": pa.array(list(range(len(lrows))), pa.int64()),
            "ts": pa.array([ts for _, ts in lrows], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c, _ in rrows], pa.string()),
            "r_turn_idx": pa.array(list(range(len(rrows))), pa.int64()),
            "r_ts": pa.array([ts for _, ts in rrows], pa.timestamp("us")),
            "r_text": pa.array([f"t{i}" for i in range(len(rrows))],
                               pa.string()),
        }
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["r_turn_idx"])
        for r in _asof_table(left, right).to_pylist()
    )
    want = []
    for i, (c, ts) in enumerate(lrows):
        best = None
        for j, (rc, rts) in enumerate(rrows):
            if rc == c and rts <= ts and (best is None or rts > rrows[best][1]):
                best = j
        if best is not None:
            want.append((f"c{c}", i, best))
    assert got == sorted(want)
