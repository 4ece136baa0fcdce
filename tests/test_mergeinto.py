"""MERGE INTO (pipelines/mergeinto.py): update+insert equals the direct
fold; clause conditions gate rows; DELETE clause tombstones; idempotent
convergence; loud refusals (dup source keys, unknown columns, missing ts,
null keys); insert-over-tombstone dominates while future log events still
win; salted layouts route source rows to the right ranges."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mergeinto import merge_into
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

TS0 = 2_000_000_000_000_000  # fixed insert event-time, past every fixture ts


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(4000, 50, seed=91, p_delete=0.12)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def _final(lk):
    return final_table(lk).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


def _source_for(before: pa.Table, n_overlap: int = 20, fresh_turn: int = 40):
    """Deterministic source: the first n_overlap live keys get new text,
    plus one fresh key per distinct conv at turn `fresh_turn`."""
    over = before.slice(0, n_overlap)
    convs = pc.unique(before["conv_id"]).to_pylist()
    rows = {
        "conv_id": over["conv_id"].to_pylist() + convs,
        "turn_idx": over["turn_idx"].to_pylist() + [fresh_turn] * len(convs),
        "role": ["editor"] * (n_overlap + len(convs)),
        "text": [f"edit-{i}" for i in range(n_overlap)]
        + [f"new-{c}" for c in convs],
        "tool": [""] * (n_overlap + len(convs)),
        "ts": [TS0] * (n_overlap + len(convs)),
    }
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        }
    )


def _expect_update_insert(before: pa.Table, src: pa.Table) -> pa.Table:
    """Sequential oracle: matched keys take source payload (target ts),
    unmatched source keys insert as-is, the rest keep."""
    key = {
        (c, t): i
        for i, (c, t) in enumerate(
            zip(before["conv_id"].to_pylist(), before["turn_idx"].to_pylist())
        )
    }
    cols = {c: before[c].to_pylist() for c in before.column_names}
    for i in range(src.num_rows):
        k = (src["conv_id"][i].as_py(), src["turn_idx"][i].as_py())
        if k in key:
            j = key[k]
            for c in ("role", "text", "tool"):
                cols[c][j] = src[c][i].as_py()
        else:
            cols["conv_id"].append(k[0])
            cols["turn_idx"].append(k[1])
            cols["role"].append(src["role"][i].as_py())
            cols["text"].append(src["text"][i].as_py())
            cols["tool"].append(src["tool"][i].as_py())
            cols["ts"].append(src["ts"][i].as_py())
    t = pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_merge_update_insert_equals_fold_and_converges(lake):
    chg, lk = lake
    before = _final(lk)
    src = _source_for(before)
    r1 = merge_into(lk, src)
    assert r1["epoch"] is not None
    assert r1["updated"] == 20 and r1["deleted"] == 0
    assert r1["inserted"] == len(pc.unique(before["conv_id"]))

    after = _final(lk)
    want = _expect_update_insert(before, src)
    assert after.select(want.column_names).equals(want)

    # idempotent convergence: same snapshot again changes nothing
    r2 = merge_into(lk, src)
    assert r2 == {"updated": 0, "deleted": 0, "inserted": 0,
                  "ranges_touched": r2["ranges_touched"], "epoch": None}


def test_merge_parquet_source_and_payload_subset(lake, tmp_path):
    """A parquet source carrying only (keys, ts, text) updates text and
    keeps every other payload column."""
    import pyarrow.parquet as pq

    chg, lk = lake
    before = _final(lk)
    src = _source_for(before).select(["conv_id", "turn_idx", "ts", "text"])
    p = str(tmp_path / "src.parquet")
    pq.write_table(src, p)
    r = merge_into(lk, p)
    assert r["updated"] == 20
    after = _final(lk)
    # the 20 matched rows changed text only; role/tool untouched
    m = _expect_update_insert(
        before,
        _source_for(before).set_column(
            2, "role",
            pa.array(
                before.slice(0, 20)["role"].to_pylist()
                + [None] * (src.num_rows - 20),
                pa.string(),
            ),
        ).set_column(
            4, "tool",
            pa.array(
                before.slice(0, 20)["tool"].to_pylist()
                + [None] * (src.num_rows - 20),
                pa.string(),
            ),
        ),
    )
    assert after.select(m.column_names).equals(m)


def test_merge_conditions_gate_rows(lake):
    chg, lk = lake
    before = _final(lk)
    src = _source_for(before)
    r = merge_into(
        lk, src,
        matched_cond=[["turn_idx", "<", 5], ["src_text", "not_like", "%3"]],
        not_matched_cond=[["turn_idx", ">=", 40]],
    )
    after = _final(lk)
    # every updated row obeys both conditions
    n_expected = 0
    for i in range(20):
        tgt_turn = before["turn_idx"][i].as_py()
        stext = src["text"][i].as_py()
        if tgt_turn < 5 and not stext.endswith("3"):
            n_expected += 1
    assert r["updated"] == n_expected
    assert r["inserted"] == len(pc.unique(before["conv_id"]))  # all at 40
    # a row failing the cond kept its old text
    for i in range(20):
        if not (before["turn_idx"][i].as_py() < 5
                and not src["text"][i].as_py().endswith("3")):
            k = (before["conv_id"][i].as_py(), before["turn_idx"][i].as_py())
            mask = pc.and_(
                pc.equal(after["conv_id"], k[0]),
                pc.equal(after["turn_idx"], k[1]),
            )
            row = after.filter(mask)
            assert row["text"][0].as_py() == before["text"][i].as_py()
            break


def test_merge_delete_clause(lake):
    chg, lk = lake
    before = _final(lk)
    src = _source_for(before)
    r = merge_into(lk, src, when_matched="delete", when_not_matched="skip",
                   matched_cond=[["turn_idx", "<", 3]])
    after = _final(lk)
    gone = before.slice(0, 20).filter(
        pc.less(before.slice(0, 20)["turn_idx"], 3)
    )
    assert r["deleted"] == gone.num_rows and r["inserted"] == 0
    assert after.num_rows == before.num_rows - gone.num_rows
    for i in range(gone.num_rows):
        mask = pc.and_(
            pc.equal(after["conv_id"], gone["conv_id"][i].as_py()),
            pc.equal(after["turn_idx"], gone["turn_idx"][i].as_py()),
        )
        assert after.filter(mask).num_rows == 0
    # delete is idempotent too
    assert merge_into(lk, src, when_matched="delete",
                      when_not_matched="skip",
                      matched_cond=[["turn_idx", "<", 3]])["epoch"] is None


def test_merge_refusals(lake):
    chg, lk = lake
    before = _final(lk)
    src = _source_for(before)
    dup = pa.concat_tables([src, src.slice(0, 1)])
    with pytest.raises(Exception, match="duplicate"):
        merge_into(lk, dup)
    with pytest.raises(ValueError, match="unknown"):
        merge_into(lk, src.append_column("sentiment",
                                         pa.nulls(src.num_rows, pa.string())))
    with pytest.raises(ValueError, match="ts"):
        merge_into(lk, src.drop_columns(["ts"]))
    bad = src.set_column(0, "conv_id",
                         pa.array([None] * src.num_rows, pa.string()))
    with pytest.raises(Exception, match="non-null"):
        merge_into(lk, bad)
    with pytest.raises(ValueError, match="when_matched"):
        merge_into(lk, src, when_matched="upsert")


def test_merge_respects_lake_expectations(lake):
    """Lake-pinned CHECK constraints gate merged rows: a violating
    snapshot aborts before commit; relaxing the rule lets it through."""
    from datax_ray.pipelines.replay import alter_lake
    from datax_ray.state.manifest import Manifest

    chg, lk = lake
    before = _final(lk)
    alter_lake(lk, expectations=[
        {"column": "turn_idx", "op": "between", "lo": 0, "hi": 30},
    ])
    head = Manifest(lk).committed_epoch()
    src = _source_for(before, fresh_turn=40)  # violates hi=30
    with pytest.raises(Exception, match="expectation"):
        merge_into(lk, src)
    assert Manifest(lk).committed_epoch() == head  # nothing committed
    assert _final(lk).equals(before)

    alter_lake(lk, clear_expectations=True)
    assert merge_into(lk, src)["epoch"] is not None


def test_merge_insert_over_tombstone_dominates_future_still_wins(lake):
    chg, lk = lake
    before = _final(lk)
    victim_c = before["conv_id"][0].as_py()
    victim_t = before["turn_idx"][0].as_py()
    tomb_ts = pc.max(before["ts"]).as_py()
    # delete the victim via a (late-ts) log event
    ev = pa.table(
        {
            "lsn": pa.array([500_000], pa.int64()),
            "ts": pa.array([tomb_ts], pa.timestamp("us")),
            "op": pa.array(["delete"], pa.string()),
            "conv_id": pa.array([victim_c], pa.string()),
            "turn_idx": pa.array([victim_t], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ddl": pa.array([None], pa.string()),
        }
    )
    write_segments(ev, chg, seg_rows=1000, start_seg=10)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))
    assert _final(lk).filter(
        pc.and_(pc.equal(_final(lk)["conv_id"], victim_c),
                pc.equal(_final(lk)["turn_idx"], victim_t))
    ).num_rows == 0

    # merge re-inserts it with an OLDER source ts — must still surface
    src = pa.table(
        {
            "conv_id": pa.array([victim_c], pa.string()),
            "turn_idx": pa.array([victim_t], pa.int32()),
            "role": pa.array(["editor"], pa.string()),
            "text": pa.array(["resurrected"], pa.string()),
            "tool": pa.array([""], pa.string()),
            "ts": pa.array([1_000_000], pa.timestamp("us")),  # ancient
        }
    )
    r = merge_into(lk, src)
    assert r["inserted"] == 1
    after = _final(lk)
    row = after.filter(
        pc.and_(pc.equal(after["conv_id"], victim_c),
                pc.equal(after["turn_idx"], victim_t))
    )
    assert row.num_rows == 1 and row["text"][0].as_py() == "resurrected"
    # its stored event-time floored at the tombstone's (domination rule)
    assert row["ts"][0].as_py() == tomb_ts

    # a genuinely newer log event still beats the merged row
    fut = ev.set_column(2, "op", pa.array(["update"], pa.string()))
    fut = fut.set_column(0, "lsn", pa.array([600_000], pa.int64()))
    import datetime

    fut = fut.set_column(
        1, "ts",
        pa.array([tomb_ts + datetime.timedelta(seconds=1)], pa.timestamp("us")),
    )
    fut = fut.set_column(5, "role", pa.array(["user"], pa.string()))
    fut = fut.set_column(6, "text", pa.array(["the future wins"], pa.string()))
    fut = fut.set_column(7, "tool", pa.array([""], pa.string()))
    write_segments(fut, chg, seg_rows=1000, start_seg=11)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))
    after = _final(lk)
    row = after.filter(
        pc.and_(pc.equal(after["conv_id"], victim_c),
                pc.equal(after["turn_idx"], victim_t))
    )
    assert row["text"][0].as_py() == "the future wins"


def test_merge_dry_run_promises_exactly(lake):
    from datax_ray.state.manifest import Manifest

    chg, lk = lake
    before = _final(lk)
    src = _source_for(before)
    head = Manifest(lk).committed_epoch()
    dry = merge_into(lk, src, dry_run=True)
    assert dry["epoch"] is None and dry["updated"] == 20
    assert Manifest(lk).committed_epoch() == head
    assert _final(lk).equals(before)
    real = merge_into(lk, src)
    assert (real["updated"], real["deleted"], real["inserted"]) == (
        dry["updated"], dry["deleted"], dry["inserted"])
    assert real["epoch"] is not None


def test_merge_from_sql_dataset_source(lake, tmp_path):
    """Any Dataset works as a merge source — here a splitPk-range SQL
    read (the DataX rdbmsreader contract feeding MERGE)."""
    import functools
    import sqlite3

    from datax_ray.sources.sqlsource import read_sql_table

    chg, lk = lake
    before = _final(lk)
    db = str(tmp_path / "snap.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE fixes (pk INTEGER PRIMARY KEY, conv_id TEXT, "
        "turn_idx INTEGER, text TEXT, ts INTEGER)"
    )
    keys = list(zip(before["conv_id"].to_pylist()[:12],
                    before["turn_idx"].to_pylist()[:12]))
    conn.executemany(
        "INSERT INTO fixes (pk, conv_id, turn_idx, text, ts) VALUES (?,?,?,?,?)",
        [(i, c, t, f"sqlfix-{i}", TS0) for i, (c, t) in enumerate(keys)],
    )
    conn.commit()
    conn.close()
    factory = functools.partial(sqlite3.connect, db, 30.0,
                                check_same_thread=False)
    src = read_sql_table(
        factory, "fixes", columns=["conv_id", "turn_idx", "text", "ts"],
        split_pk="pk", num_splits=4,
    )
    r = merge_into(lk, src, when_not_matched="skip")
    assert r["updated"] == 12
    after = _final(lk)
    for i, (c, t) in enumerate(keys):
        m = after.filter(pc.and_(pc.equal(after["conv_id"], c),
                                 pc.equal(after["turn_idx"], t)))
        assert m["text"][0].as_py() == f"sqlfix-{i}"


def test_merge_rows_flow_through_change_feed(lake):
    """A merge epoch is an ordinary change record: reconstructing the
    final state from the change feed alone must include the merge's
    updates, inserts and their event-times."""
    from datax_ray.pipelines.feed import read_change_feed
    from datax_ray.schemas import DELETED_COL, LSN_COL

    chg, lk = lake
    before = _final(lk)
    src = _source_for(before)
    assert merge_into(lk, src)["epoch"] is not None
    after = _final(lk)

    feed = read_change_feed(lk, -1).take_all()
    # LWW-fold the feed rows per key (driver-side: test fixture scale)
    best = {}
    for r in feed:
        k = (r["conv_id"], r["turn_idx"])
        o = (r["ts"], r[LSN_COL])
        if k not in best or o > (best[k]["ts"], best[k][LSN_COL]):
            best[k] = r
    live = sorted(
        (k for k, r in best.items() if not r[DELETED_COL]),
    )
    got = sorted(zip(after["conv_id"].to_pylist(),
                     after["turn_idx"].to_pylist()))
    assert live == got
    for k in live:
        row = best[k]
        m = after.filter(pc.and_(pc.equal(after["conv_id"], k[0]),
                                 pc.equal(after["turn_idx"], k[1])))
        assert m["text"][0].as_py() == row["text"]
        assert m["ts"][0].as_py() == row["ts"]


def test_merge_salted_layout_routes_correctly(tmp_path, ray_session):
    changes = gen_changes(3000, 20, seed=92, p_delete=0.1, hot_key_zipf_s=1.2)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=16,
                        salt_turn_width=4, segments_per_epoch=2))
    before = _final(lk)
    src = _source_for(before, n_overlap=15, fresh_turn=33)
    r = merge_into(lk, src)
    assert r["updated"] == 15
    after = _final(lk)
    want = _expect_update_insert(before, src)
    assert after.select(want.column_names).equals(want)


def test_merge_refuses_heterogeneous_source_dir(lake, tmp_path):
    """ADVICE r3: a parquet-directory source whose files disagree on
    schema must refuse loudly up front, not silently drop the extra
    columns of later files (or KeyError mid-pipeline)."""
    import pyarrow.parquet as pq

    chg, lk = lake
    d = tmp_path / "srcdir"
    d.mkdir()
    base = {
        "conv_id": pa.array(["x"]), "turn_idx": pa.array([0], pa.int32()),
        "ts": pa.array([TS0], pa.timestamp("us")), "text": pa.array(["a"]),
    }
    pq.write_table(pa.table(base), str(d / "a.parquet"))
    pq.write_table(pa.table({**base, "role": pa.array(["user"])}),
                   str(d / "b.parquet"))
    with pytest.raises(ValueError, match="disagreeing schemas"):
        merge_into(lk, str(d))
