"""Semantic edge cases for the round-3 iterative/transactional queries,
isolated from the DuckDB parity suite on hand-built fixtures:

- cdc_txn_atomic_apply: a committed runner-up RESURFACES when the LWW
  winner's transaction aborts (the case a combiner-before-abort-gate
  implementation gets wrong).
- pagerank_parts: matches a sequential pure-python integer reference.
- bfs_levels_parts: exact hop levels on a chain graph, depth cutoff held.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datax_ray.pipelines.queries import (
    bfs_levels_parts,
    cdc_txn_atomic_apply,
    pagerank_parts,
)


def _write_events(dirpath: str, eids, users, ts_us):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
            }
        ),
        os.path.join(dirpath, "events.parquet"),
    )


def _write_lineitem(dirpath: str, orderkeys, partkeys):
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, pa.int64()),
                "l_partkey": pa.array(partkeys, pa.int64()),
            }
        ),
        os.path.join(dirpath, "lineitem.parquet"),
    )


def test_txn_abort_resurfaces_committed_runner_up(tmp_path):
    """Key (conv-1, turn 1) has two versions: eid=26 (winner by ts, txn 3)
    and eid=1 (runner-up, txn 0). eid=29 (29 % 13 == 3) aborts txn 3
    (24..31), so the winner AND the marker row are withheld and the
    committed runner-up must come back — a combiner applied before the
    abort gate would have discarded it."""
    sf = str(tmp_path)
    _write_events(sf, eids=[1, 26, 29], users=[1, 1, 9], ts_us=[100, 200, 50])
    out = cdc_txn_atomic_apply(sf).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["conv_id"] == "conv-1"
    assert row["turn_idx"] == 1
    assert row["text"] == "payload-1"  # the runner-up's payload, not 26's
    assert row["role"] == "assistant"  # odd eid => update => assistant


def test_txn_abort_all_or_nothing(tmp_path):
    """A txn with a marker loses every event; a marker-free txn keeps all.
    eids 8..10 share txn 1 with marker eid=16? no — txn(16)=2. Use eids
    16,17,19 in txn 2 (16..23) where 16 % 13 == 3 aborts the whole txn."""
    sf = str(tmp_path)
    # txn 2 = lsns 16..23; 16 % 13 == 3 -> txn 2 aborted entirely.
    # txn 0 = lsns 0..7; no marker (avoid eid 3) -> kept.
    _write_events(
        sf,
        eids=[1, 2, 16, 17, 19],
        users=[5, 6, 7, 7, 7],
        ts_us=[10, 20, 30, 40, 50],
    )
    out = cdc_txn_atomic_apply(sf).to_pandas()
    # only eids 1 (conv-5) and 2 (conv-6) survive
    assert sorted(out["conv_id"]) == ["conv-5", "conv-6"]
    assert set(out["text"]) == {"payload-1", "payload-2"}


def _pagerank_reference(edges, iters=3):
    """Sequential integer PageRank mirroring the query's exact rule."""
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    pr = {u: 100000 for u in deg}
    for _ in range(iters):
        s = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + pr[u] // deg[u]
        pr = {v: 15000 + 85 * sv // 100 for v, sv in s.items()}
    return pr


def test_pagerank_matches_sequential_reference(tmp_path):
    sf = str(tmp_path)
    # orders: {1,2}, {2,3}, {1,3,4} -> K3 plus a pendant on 3? no: edges
    # from co-purchase: (1,2),(2,3),(1,3),(1,4),(3,4) undirected
    _write_lineitem(
        sf,
        orderkeys=[10, 10, 20, 20, 30, 30, 30],
        partkeys=[1, 2, 2, 3, 1, 3, 4],
    )
    und = {(1, 2), (2, 3), (1, 3), (1, 4), (3, 4)}
    directed = sorted(und | {(v, u) for u, v in und})
    want = _pagerank_reference(directed)
    got = pagerank_parts(sf).to_pandas().set_index("part")["pr"].to_dict()
    assert got == want


def test_bfs_levels_chain(tmp_path):
    """Chain 97 - 1 - 2 - 3 - 4 (orders of two parts each): seed is 97
    (97 % 97 == 0); expected levels 0,1,2,3 and part 4 EXCLUDED by the
    depth-3 cutoff."""
    sf = str(tmp_path)
    _write_lineitem(
        sf,
        orderkeys=[10, 10, 20, 20, 30, 30, 40, 40],
        partkeys=[97, 1, 1, 2, 2, 3, 3, 4],
    )
    out = bfs_levels_parts(sf).to_pandas().set_index("part")["level"].to_dict()
    assert out == {97: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_levels_min_hop_not_revisited(tmp_path):
    """Diamond: 97-{1,2}, 1-3, 2-3: node 3 gets level 2 exactly once even
    though two frontier paths reach it."""
    sf = str(tmp_path)
    _write_lineitem(
        sf,
        orderkeys=[10, 10, 11, 11, 20, 20, 21, 21],
        partkeys=[97, 1, 97, 2, 1, 3, 2, 3],
    )
    df = bfs_levels_parts(sf).to_pandas()
    assert len(df) == len(set(df["part"]))  # one row per node
    out = df.set_index("part")["level"].to_dict()
    assert out == {97: 0, 1: 1, 2: 1, 3: 2}
