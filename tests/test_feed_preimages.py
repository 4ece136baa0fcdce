"""Delta-CDF-style preimage feed: per-epoch diff equals the time-travel
reconstruction, additive aggregation folds exactly, losers of the LWW
race emit nothing, and purge deletes carry old values."""

import collections

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.feed import read_change_feed_preimages
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table, read_lake
from datax_ray.state.manifest import Manifest

KEY = ["conv_id", "turn_idx"]


def _build(tmp_path, tag="p", n_events=4000, n_convs=50, seg_rows=800):
    changes = gen_changes(n_events, n_convs, seed=91, out_of_order_frac=0.1)
    chg, lake = str(tmp_path / f"chg_{tag}"), str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg, seg_rows=seg_rows)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=1))
    return changes, chg, lake


def _state(lake, epoch):
    tables = [
        t for t in ray.get(read_lake(lake, as_of_epoch=epoch).to_arrow_refs())
        if t.num_rows
    ]
    if not tables:
        return pd.DataFrame(columns=[*KEY, "text"])
    return pa.concat_tables(tables).to_pandas()


def test_preimage_feed_equals_time_travel_diff(tmp_path):
    _, _, lake = _build(tmp_path, "tt")
    feed = read_change_feed_preimages(lake, -1).to_pandas()

    for e in range(Manifest(lake).committed_epoch() + 1):
        prev = _state(lake, e - 1) if e > 0 else pd.DataFrame(columns=[*KEY, "text"])
        cur = _state(lake, e)
        fe = feed[feed["_epoch"] == e]
        pk = set(map(tuple, prev[KEY].itertuples(index=False)))
        ck_rows = {tuple(r[:2]): r[2] for r in cur[[*KEY, "text"]].itertuples(index=False)}
        pk_rows = {tuple(r[:2]): r[2] for r in prev[[*KEY, "text"]].itertuples(index=False)}
        ck = set(ck_rows)

        want_ins = ck - pk
        want_del = pk - ck
        want_upd = {k for k in ck & pk if ck_rows[k] != pk_rows[k]}

        got_ins = set(map(tuple, fe[fe["_change_type"] == "insert"][KEY].itertuples(index=False)))
        got_del = set(map(tuple, fe[fe["_change_type"] == "delete"][KEY].itertuples(index=False)))
        got_post = set(map(tuple, fe[fe["_change_type"] == "update_postimage"][KEY].itertuples(index=False)))

        assert got_ins == want_ins, f"epoch {e} inserts"
        assert got_del == want_del, f"epoch {e} deletes"
        # updates may include same-payload new versions (a genuinely newer
        # event with identical text) — every value change must be present.
        assert want_upd <= got_post, f"epoch {e} updates"
        # and every reported update must reference a key live on both sides
        assert got_post <= (ck & pk), f"epoch {e} spurious updates"

        # delete rows carry the OLD text
        for r in fe[fe["_change_type"] == "delete"][[*KEY, "text"]].itertuples(index=False):
            assert pk_rows[tuple(r[:2])] == r[2]


def test_preimage_feed_folds_additively(tmp_path):
    _, _, lake = _build(tmp_path, "add")
    feed = read_change_feed_preimages(lake, -1).to_pandas()
    live = final_table(lake).to_pandas()

    cnt: collections.Counter = collections.Counter()
    tot: collections.Counter = collections.Counter()
    for ct, conv, text in zip(
        feed["_change_type"], feed["conv_id"], feed["text"]
    ):
        n = len(text) if isinstance(text, str) else 0
        if ct == "insert":
            cnt[conv] += 1
            tot[conv] += n
        elif ct == "delete":
            cnt[conv] -= 1
            tot[conv] -= n
        elif ct == "update_postimage":
            tot[conv] += n
        elif ct == "update_preimage":
            tot[conv] -= n

    want_cnt = live.groupby("conv_id").size().to_dict()
    want_tot = (
        live.assign(n=live["text"].str.len().fillna(0).astype(int))
        .groupby("conv_id")["n"].sum().to_dict()
    )
    assert {k: v for k, v in cnt.items() if v != 0} == want_cnt
    assert {k: v for k, v in tot.items() if v != 0} == want_tot


def test_preimage_feed_purge_and_stale_loser(tmp_path):
    import datetime
    import os

    from datax_ray.pipelines.purge import purge
    from datax_ray.schemas import CHANGES_SCHEMA

    changes, chg, lake = _build(tmp_path, "pg", seg_rows=2000)
    m = Manifest(lake)
    a = m.committed_epoch()
    live = final_table(lake)
    conv = live["conv_id"][0].as_py()
    n_live = int(pc.sum(pc.equal(live["conv_id"], conv)).as_py())

    purge(lake, [conv])
    b = m.committed_epoch()
    fe = read_change_feed_preimages(lake, a, b).to_pandas()
    dels = fe[fe["_change_type"] == "delete"]
    assert len(dels) == n_live and set(dels["conv_id"]) == {conv}
    assert dels["text"].notna().all()  # old values ride on the delete rows

    # A late STALE event (lsn above watermark, older ts) loses the LWW
    # race against the tombstone: state unchanged => EMPTY preimage feed.
    row = live.filter(pc.equal(live["conv_id"], conv)).slice(0, 1)
    late = pa.Table.from_pylist(
        [{
            "lsn": int(pc.max(changes["lsn"]).as_py()) + 9,
            "ts": row["ts"][0].as_py() - datetime.timedelta(seconds=3600),
            "op": "update", "conv_id": conv,
            "turn_idx": row["turn_idx"][0].as_py(),
            "role": "user", "text": "resurrected?", "tool": "", "ddl": None,
        }],
        schema=CHANGES_SCHEMA,
    )
    pq.write_table(late, os.path.join(chg, "seg-000000600.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    c = m.committed_epoch()
    fe2 = read_change_feed_preimages(lake, b, c).to_pandas()
    assert len(fe2) == 0


def test_change_feed_summary_matches_feed(tmp_path):
    """The diff verb's summary equals a direct reduction of the preimage
    feed, and net_rows equals the live-row delta between the two epochs."""
    from datax_ray.pipelines.feed import change_feed_summary

    _, _, lake = _build(tmp_path, "sum")
    head = Manifest(lake).committed_epoch()
    mid = head // 2

    out = change_feed_summary(lake, mid, head)
    feed = read_change_feed_preimages(lake, mid, head).to_pandas()
    want = feed["_change_type"].value_counts().to_dict()
    assert out["changes"] == want
    assert out["rows"] == len(feed)
    assert out["net_rows"] == (
        len(_state(lake, head)) - len(_state(lake, mid))
    )
    # empty window
    empty = change_feed_summary(lake, head, head)
    assert empty["rows"] == 0 and empty["changes"] == {}
