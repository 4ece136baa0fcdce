"""Key purge (right-to-be-forgotten): logical tombstoning, hard physical
scrub, idempotence, resurrect-protection, and the change-feed contract."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.purge import purge
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.schemas import CHANGES_SCHEMA
from datax_ray.sinks.lake import final_table, read_lake


def _build(tmp_path, tag="p", salt_turn_width=None, n_events=4000, n_convs=60,
           corrupt_frac=0.0):
    changes = gen_changes(n_events, n_convs, seed=11, out_of_order_frac=0.15,
                          corrupt_frac=corrupt_frac)
    chg = str(tmp_path / f"chg_{tag}")
    lake = str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg, seg_rows=1500)
    replay(ReplayConfig(
        changes_dir=chg, lake_dir=lake, num_partitions=8,
        salt_turn_width=salt_turn_width,
    ))
    return changes, chg, lake


def _purge_set(lake, k=5):
    live = final_table(lake)
    return sorted(set(live["conv_id"].to_pylist()))[:k], live


@pytest.mark.parametrize("salt", [None, 4])
def test_purge_logical_matches_filtered_oracle(tmp_path, salt):
    changes, _, lake = _build(tmp_path, f"log{salt}", salt_turn_width=salt)
    convs, live = _purge_set(lake)
    n_purged = int(pc.sum(pc.is_in(live["conv_id"], value_set=pa.array(convs))).as_py())
    assert n_purged > 0

    rep = purge(lake, convs)
    assert rep["tombstoned_rows"] == n_purged

    ours = final_table(lake)
    oracle = sequential_replay(changes)
    oracle = oracle.filter(
        pc.invert(pc.is_in(oracle["conv_id"], value_set=pa.array(convs)))
    )
    assert ours.equals(oracle)

    # Idempotent: no live rows remain for the keys, nothing commits.
    rep2 = purge(lake, convs)
    assert rep2["tombstoned_rows"] == 0 and rep2["epoch"] is None


def test_purge_hard_scrubs_payload_and_bounds_history(tmp_path):
    changes, _, lake = _build(tmp_path, "hard", corrupt_frac=0.05)
    convs, _ = _purge_set(lake)
    pre_epoch = 0  # history before the purge

    rep = purge(lake, convs, hard=True)
    # ~200 dirty rows over 60 convs → the 5 purged convs must have hit
    # the dead-letter area, and hard purge must have scrubbed them.
    assert rep["deadletter_rows_scrubbed"] > 0

    # Final state still equals the filtered oracle.
    oracle = sequential_replay(changes)
    oracle = oracle.filter(
        pc.invert(pc.is_in(oracle["conv_id"], value_set=pa.array(convs)))
    )
    assert final_table(lake).equals(oracle)

    # The payload bytes are PHYSICALLY gone: no file ANYWHERE under the
    # lake (bases, fragments, dead-letter) holds a non-null text for a
    # purged conv.
    keyset = pa.array(convs)
    scanned = 0
    for path in glob.glob(f"{lake}/**/*.parquet", recursive=True):
        t = pq.read_table(path)
        if "conv_id" not in t.column_names or "text" not in t.column_names:
            continue
        scanned += 1
        hit = t.filter(pc.is_in(t["conv_id"], value_set=keyset))
        if hit.num_rows:
            assert pc.count(hit["text"], mode="only_valid").as_py() == 0, path
    assert scanned > 0

    # Scrub is idempotent: a second hard purge finds nothing left to do.
    rep2 = purge(lake, convs, hard=True)
    assert rep2["tombstoned_rows"] == 0
    assert rep2["deadletter_rows_scrubbed"] == 0

    # Pre-purge history is vacuumed — time travel to it must raise.
    with pytest.raises(ValueError):
        read_lake(lake, as_of_epoch=pre_epoch).count()


def test_purge_tombstone_defeats_late_stale_event(tmp_path):
    changes, chg, lake = _build(tmp_path, "stale")
    convs, live = _purge_set(lake, k=2)
    purge(lake, convs)

    import datetime

    # A LATE event (lsn above the watermark) carrying an OLD ts for a
    # purged key must lose the LWW race against the purge tombstone
    # (which holds the stored winner's ts and lsn+1).
    row = live.filter(pc.equal(live["conv_id"], convs[0])).slice(0, 1)
    stale_ts = row["ts"][0].as_py() - datetime.timedelta(seconds=3600)
    hi_lsn = int(pc.max(changes["lsn"]).as_py()) + 100
    late = pa.Table.from_pylist(
        [{
            "lsn": hi_lsn, "ts": stale_ts, "op": "update",
            "conv_id": convs[0],
            "turn_idx": row["turn_idx"][0].as_py(),
            "role": "user", "text": "resurrected?", "tool": "",
            "ddl": None,
        }],
        schema=CHANGES_SCHEMA,
    )
    pq.write_table(late, os.path.join(chg, "seg-000000099.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    after = final_table(lake)
    assert not pc.any(pc.equal(after["conv_id"], convs[0])).as_py()

    # A genuinely NEWER event resurrects the key — purge does not fence
    # the future (new data after a purge is new data).
    new_ts = row["ts"][0].as_py() + datetime.timedelta(seconds=3600)
    fresh = late.set_column(
        1, "ts", pa.array([new_ts], pa.timestamp("us"))
    ).set_column(0, "lsn", pa.array([hi_lsn + 1], pa.int64()))
    pq.write_table(fresh, os.path.join(chg, "seg-000000120.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    after2 = final_table(lake)
    hit = after2.filter(pc.equal(after2["conv_id"], convs[0]))
    assert hit.num_rows == 1 and hit["text"][0].as_py() == "resurrected?"


def test_purge_flows_through_change_feed(tmp_path):
    """Purge tombstones are ordinary change records: the feed over the
    purge epoch emits them as _deleted rows, so a downstream consumer
    folds the forget-request incrementally (no resync needed)."""
    import ray

    from datax_ray.pipelines.feed import read_change_feed
    from datax_ray.schemas import DELETED_COL, INTERNAL_COLS
    from datax_ray.sinks.lake import lake_schema
    from datax_ray.stages.merge import merge_states
    from datax_ray.state.manifest import Manifest

    _, _, lake = _build(tmp_path, "feed")
    m = Manifest(lake)
    a = m.committed_epoch()
    convs, _ = _purge_set(lake, k=3)
    rep = purge(lake, convs)
    b = rep["epoch"]

    feed = pa.concat_tables(
        [t for t in ray.get(read_change_feed(lake, a, b).to_arrow_refs()) if t.num_rows]
    )
    feed_keys = set(feed.filter(feed["_deleted"])["conv_id"].to_pylist())
    assert set(convs) <= feed_keys

    # Fold-forward contract across the purge epoch: state(A) + feed(A,B]
    # == live state(B).
    base_tables = [
        t
        for t in ray.get(
            read_lake(
                lake, as_of_epoch=a, keep_tombstones=True, include_internal=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    state = merge_states(
        base_tables + [feed.drop_columns(["_epoch"])], lake_schema(lake, b)
    )
    live = state.filter(pc.fill_null(pc.invert(state[DELETED_COL]), True))
    live = live.drop_columns([c for c in INTERNAL_COLS if c in live.column_names])
    assert live.equals(final_table(lake))


def test_purge_tombstone_lsn_never_collides_with_real_event(tmp_path):
    """Regression: a real future event landing on exactly
    (winner_ts, winner_lsn + 1) — same-microsecond update whose lsn is
    next in the log — must NOT tie the purge tombstone. Synthetic lsns
    live in a reserved space (winner + 1 + 2^62), so the tombstone wins
    outright (same ts, higher lsn), the lake stays purged, and the
    preimage feed (strict comparison) agrees: no emitted change."""
    import os

    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.schemas import CHANGES_SCHEMA
    from datax_ray.state.manifest import Manifest

    changes, chg, lake = _build(tmp_path, "tie")
    live = final_table(lake)
    conv = live["conv_id"][0].as_py()
    row = live.filter(pc.equal(live["conv_id"], conv)).slice(0, 1)
    winner_ts = row["ts"][0].as_py()

    purge(lake, [conv])
    b = Manifest(lake).committed_epoch()

    # The colliding event: SAME ts as the stored winner, lsn above the
    # watermark (so dedup passes it through).
    tie = pa.Table.from_pylist(
        [{
            "lsn": int(pc.max(changes["lsn"]).as_py()) + 1,
            "ts": winner_ts,
            "op": "update", "conv_id": conv,
            "turn_idx": row["turn_idx"][0].as_py(),
            "role": "user", "text": "tie-resurrected?", "tool": "",
            "ddl": None,
        }],
        schema=CHANGES_SCHEMA,
    )
    pq.write_table(tie, os.path.join(chg, "seg-000000800.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))

    after = final_table(lake)
    assert not pc.any(pc.equal(after["conv_id"], conv)).as_py()
    c = Manifest(lake).committed_epoch()
    feed = read_change_feed_preimages(lake, b, c).to_pandas()
    assert len(feed) == 0  # merge and feed agree: nothing changed
