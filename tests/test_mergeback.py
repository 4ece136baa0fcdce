"""Branch merge-back (pipelines/mergeback.py): disjoint divergence merges
to the exact full-log fold (incl. event-times); LWW losers applied on the
branch never resurrect; conflict policies branch/parent/abort; deletes
(incl. compacted-away tombstones) propagate; provenance and schema
refusals; layout-mismatched branch routes correctly; idempotent re-merge."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.clone import clone_lake
from datax_ray.pipelines.mergeback import merge_back
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _final(lk):
    return final_table(lk).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


def _event(lsn, ts, op, conv, turn, role=None, text=None, tool=None, ddl=None):
    return pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "ts": pa.array([ts], pa.timestamp("us")),
            "op": pa.array([op], pa.string()),
            "conv_id": pa.array([conv], pa.string()),
            "turn_idx": pa.array([turn], pa.int32()),
            "role": pa.array([role], pa.string()),
            "text": pa.array([text], pa.string()),
            "tool": pa.array([tool], pa.string()),
            "ddl": pa.array([ddl], pa.string()),
        }
    )


@pytest.fixture()
def forked(tmp_path, ray_session):
    """Parent with tranche 1 committed, branch cloned from it; tranche 2
    written to the shared changes dir but not yet replayed anywhere."""
    changes = gen_changes(4000, 50, seed=77, p_delete=0.12)
    chg = str(tmp_path / "chg")
    parent = str(tmp_path / "parent")
    branch = str(tmp_path / "branch")
    write_segments(changes.slice(0, 2000), chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=parent, num_partitions=8,
                        segments_per_epoch=1))
    clone_lake(parent, branch)
    write_segments(changes.slice(2000), chg, seg_rows=1000, start_seg=2)
    return changes, chg, parent, branch


def test_disjoint_merge_equals_full_fold(forked, tmp_path):
    changes, chg, parent, branch = forked
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8,
                        segments_per_epoch=1))
    r = merge_back(parent, branch)
    assert r["epoch"] is not None and r["conflicts"] == 0 and r["applied"] > 0

    oracle_lk = str(tmp_path / "oracle")
    replay(ReplayConfig(changes_dir=chg, lake_dir=oracle_lk,
                        num_partitions=8, segments_per_epoch=2))
    assert _final(parent).equals(_final(oracle_lk))  # incl. event-times

    # idempotent: a second merge finds everything value-equal
    r2 = merge_back(parent, branch)
    assert r2["epoch"] is None and r2["applied"] == 0

    # a genuinely newer log event on the parent still beats merged rows
    row = _final(parent).slice(0, 1)
    fut_ts = pc.max(_final(parent)["ts"]).as_py()
    ev = _event(900_000, fut_ts, "update", row["conv_id"][0].as_py(),
                row["turn_idx"][0].as_py(), role="user",
                text="the future wins", tool="")
    write_segments(ev, chg, seg_rows=1000, start_seg=20)
    replay(ReplayConfig(changes_dir=chg, lake_dir=parent, num_partitions=8))
    after = _final(parent)
    got = after.filter(pc.and_(
        pc.equal(after["conv_id"], row["conv_id"][0].as_py()),
        pc.equal(after["turn_idx"], row["turn_idx"][0].as_py()),
    ))
    assert got["text"][0].as_py() == "the future wins"


def test_branch_loser_never_resurrects(forked):
    changes, chg, parent, branch = forked
    before = _final(parent)
    victim_c = before["conv_id"][0].as_py()
    victim_t = before["turn_idx"][0].as_py()
    # an out-of-order UPDATE with an ancient ts: lands as a fragment on
    # the branch but LOSES the fold — merge-back must not surface it.
    # Branch-LOCAL changes dir (unique segment name: committed segments
    # are tracked by basename) so tranche 2 stays unapplied on the branch.
    bchg = chg + "_loser"
    ev = _event(800_000, 1_000, "update", victim_c, victim_t,
                role="user", text="stale loser", tool="")
    write_segments(ev, bchg, seg_rows=1000, start_seg=30)
    replay(ReplayConfig(changes_dir=bchg, lake_dir=branch, num_partitions=8))
    bstate = _final(branch)
    got_b = bstate.filter(pc.and_(
        pc.equal(bstate["conv_id"], victim_c),
        pc.equal(bstate["turn_idx"], victim_t),
    ))
    assert got_b["text"][0].as_py() != "stale loser"  # lost on the branch

    r = merge_back(parent, branch)
    assert r["epoch"] is None and r["applied"] == 0  # value-equal no-op
    after = _final(parent)
    got = after.filter(pc.and_(
        pc.equal(after["conv_id"], victim_c),
        pc.equal(after["turn_idx"], victim_t),
    ))
    assert got["text"][0].as_py() == before["text"][0].as_py()


@pytest.mark.parametrize("policy", ["abort", "parent", "branch"])
def test_conflict_policies(forked, tmp_path, policy):
    changes, chg, parent, branch = forked
    before = _final(parent)
    k_c = before["conv_id"][0].as_py()
    k_t = before["turn_idx"][0].as_py()
    base_ts = pc.max(before["ts"]).as_py()

    # parent and branch both rewrite the SAME key after the fork, via
    # side-local change dirs so neither sees the other's segment
    pchg = str(tmp_path / f"pchg_{policy}")
    bchg = str(tmp_path / f"bchg_{policy}")
    import datetime

    dt = datetime.timedelta
    write_segments(_event(700_001, base_ts + dt(seconds=10), "update", k_c,
                          k_t, role="user", text="parent says", tool=""),
                   pchg, seg_rows=10, start_seg=60)
    write_segments(_event(700_002, base_ts + dt(seconds=20), "update", k_c,
                          k_t, role="user", text="branch says", tool=""),
                   bchg, seg_rows=10, start_seg=61)
    replay(ReplayConfig(changes_dir=pchg, lake_dir=parent, num_partitions=8))
    replay(ReplayConfig(changes_dir=bchg, lake_dir=branch, num_partitions=8))

    if policy == "abort":
        head = _final(parent)
        with pytest.raises(Exception, match="conflict"):
            merge_back(parent, branch, on_conflict="abort")
        assert _final(parent).equals(head)  # nothing committed
        return

    r = merge_back(parent, branch, on_conflict=policy, list_conflicts=5)
    assert {"conv_id": k_c, "turn_idx": k_t} in r["conflict_keys"]
    after = _final(parent)
    got = after.filter(pc.and_(pc.equal(after["conv_id"], k_c),
                               pc.equal(after["turn_idx"], k_t)))
    if policy == "parent":
        assert got["text"][0].as_py() == "parent says"
        assert r["conflicts"] >= 1
    else:
        assert got["text"][0].as_py() == "branch says"
        assert r["conflicts"] >= 1
        # branch-wins floors the event-time at the parent's for dominance
        assert got["ts"][0].as_py() >= base_ts


def test_branch_delete_propagates(forked):
    changes, chg, parent, branch = forked
    before = _final(parent)
    victim_c = before["conv_id"][0].as_py()
    victim_t = before["turn_idx"][0].as_py()
    import datetime

    # far past every fixture ts — must win the branch fold over tranche 2
    ev = _event(810_000,
                pc.max(before["ts"]).as_py() + datetime.timedelta(days=365),
                "delete", victim_c, victim_t)
    write_segments(ev, chg, seg_rows=1000, start_seg=40)
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8))
    r = merge_back(parent, branch)
    assert r["epoch"] is not None and r["applied"] >= 1
    after = _final(parent)
    assert after.filter(pc.and_(
        pc.equal(after["conv_id"], victim_c),
        pc.equal(after["turn_idx"], victim_t),
    )).num_rows == 0
    assert merge_back(parent, branch)["epoch"] is None


def test_provenance_and_schema_refusals(forked, tmp_path):
    changes, chg, parent, branch = forked
    # an unrelated lake is not a branch of parent
    other_chg = str(tmp_path / "ochg")
    other = str(tmp_path / "other")
    write_segments(gen_changes(500, 10, seed=5), other_chg, seg_rows=500)
    replay(ReplayConfig(changes_dir=other_chg, lake_dir=other,
                        num_partitions=4))
    with pytest.raises(ValueError, match="not a branch"):
        merge_back(parent, other)

    # branch evolves a column the parent lacks -> loud refusal
    ddl = _event(820_000, pc.max(_final(parent)["ts"]).as_py(), "ddl",
                 "conv-ddl", 0,
                 ddl='{"action":"add_column","name":"sentiment","type":"string"}')
    write_segments(ddl, chg, seg_rows=1000, start_seg=50)
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8))
    with pytest.raises(ValueError, match="evolved"):
        merge_back(parent, branch)


def test_incremental_cursor_narrows_repeat_syncs(forked, tmp_path):
    """A second sync reads only the branch's NEW epochs (cursor in the
    parent's properties), and still lands the exact fold."""
    changes, chg, parent, branch = forked
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8,
                        segments_per_epoch=1))
    r1 = merge_back(parent, branch)
    assert r1["epoch"] is not None

    # more divergence on the branch only
    bchg = str(tmp_path / "bchg_inc")
    more = gen_changes(1200, 50, seed=78, p_delete=0.1)
    more = more.set_column(0, "lsn", pc.add(more["lsn"], 2_000_000))
    write_segments(more, bchg, seg_rows=600, start_seg=70)
    replay(ReplayConfig(changes_dir=bchg, lake_dir=branch, num_partitions=8))

    r2 = merge_back(parent, branch)
    assert r2["epoch"] is not None
    # the second sync's feed window starts where the first one ended
    assert r2["feed_from"] > r1["feed_from"]

    oracle_lk = str(tmp_path / "oracle_inc")
    replay(ReplayConfig(changes_dir=chg, lake_dir=oracle_lk,
                        num_partitions=8, segments_per_epoch=2))
    replay(ReplayConfig(changes_dir=bchg, lake_dir=oracle_lk,
                        num_partitions=8))
    assert _final(parent).equals(_final(oracle_lk))
    assert merge_back(parent, branch)["epoch"] is None  # converged


def test_dry_run_audits_without_writing(forked):
    from datax_ray.state.manifest import Manifest

    changes, chg, parent, branch = forked
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8,
                        segments_per_epoch=1))
    head = Manifest(parent).committed_epoch()
    before = _final(parent)
    dry = merge_back(parent, branch, dry_run=True)
    assert dry["applied"] > 0 and dry["epoch"] is None
    assert Manifest(parent).committed_epoch() == head
    assert _final(parent).equals(before)
    # the real merge applies exactly what the audit promised
    real = merge_back(parent, branch)
    assert real["applied"] == dry["applied"] and real["epoch"] is not None


def test_branch_chain_merges_compose(forked, tmp_path):
    """Branch-of-branch: curate on a grandchild, merge up the chain
    (child ← grandchild, then parent ← child) — provenance binds each
    merge to the immediate parent, and the root ends at the full fold."""
    changes, chg, parent, branch = forked
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8,
                        segments_per_epoch=1))
    grand = str(tmp_path / "grand")
    clone_lake(branch, grand)
    gchg = str(tmp_path / "gchg")
    more = gen_changes(800, 50, seed=79, p_delete=0.1)
    more = more.set_column(0, "lsn", pc.add(more["lsn"], 3_000_000))
    write_segments(more, gchg, seg_rows=400, start_seg=80)
    replay(ReplayConfig(changes_dir=gchg, lake_dir=grand, num_partitions=8))

    # merging the grandchild straight into the ROOT refuses (provenance)
    with pytest.raises(ValueError, match="not a branch"):
        merge_back(parent, grand)

    assert merge_back(branch, grand)["epoch"] is not None
    assert merge_back(parent, branch)["epoch"] is not None

    oracle_lk = str(tmp_path / "oracle_chain")
    replay(ReplayConfig(changes_dir=chg, lake_dir=oracle_lk,
                        num_partitions=8, segments_per_epoch=2))
    replay(ReplayConfig(changes_dir=gchg, lake_dir=oracle_lk,
                        num_partitions=8))
    assert _final(parent).equals(_final(oracle_lk))


def test_parent_expectations_gate_mergeback(forked):
    """The PARENT's pinned CHECK constraints veto a merge-back whose
    branch rows violate them — abort before commit."""
    from datax_ray.pipelines.replay import alter_lake
    from datax_ray.state.manifest import Manifest

    changes, chg, parent, branch = forked
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8,
                        segments_per_epoch=1))
    alter_lake(parent, expectations=[
        {"column": "text", "op": "max_len", "value": 3},
    ])
    head = Manifest(parent).committed_epoch()
    before = _final(parent)
    with pytest.raises(Exception, match="expectation"):
        merge_back(parent, branch)
    assert Manifest(parent).committed_epoch() == head
    assert _final(parent).equals(before)


def test_layout_mismatch_routes_correctly(forked, tmp_path):
    from datax_ray.pipelines.repartition import repartition_lake

    changes, chg, parent, branch = forked
    replay(ReplayConfig(changes_dir=chg, lake_dir=branch, num_partitions=8,
                        segments_per_epoch=1))
    repartition_lake(branch, num_partitions=16, frag_ranges=4)
    r = merge_back(parent, branch)
    assert r["epoch"] is not None

    oracle_lk = str(tmp_path / "oracle")
    replay(ReplayConfig(changes_dir=chg, lake_dir=oracle_lk,
                        num_partitions=8, segments_per_epoch=2))
    assert _final(parent).equals(_final(oracle_lk))


def test_identical_payload_later_ts_bumps_floor(tmp_path, ray_session):
    """ADVICE r3: a branch winner with the SAME payload but a LATER ts than
    the parent's live row must still rewrite (ts-floor bump) — otherwise a
    subsequent parent event with an intermediate ts wins LWW even though it
    loses against the fold of the union of both logs."""
    import datetime as dt

    def t(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    chg = str(tmp_path / "chg")
    parent = str(tmp_path / "parent")
    branch = str(tmp_path / "branch")
    write_segments(
        _event(1, t(10), "insert", "c1", 0, role="user", text="same", tool=""),
        chg, seg_rows=10,
    )
    replay(ReplayConfig(changes_dir=chg, lake_dir=parent, num_partitions=4))
    clone_lake(parent, branch)

    # branch: identical payload, later event-time
    bchg = str(tmp_path / "bchg")
    write_segments(
        _event(2, t(30), "update", "c1", 0, role="user", text="same", tool=""),
        bchg, seg_rows=10, start_seg=1,
    )
    replay(ReplayConfig(changes_dir=bchg, lake_dir=branch, num_partitions=4))

    r = merge_back(parent, branch)
    assert r["applied"] == 1  # NOT value-equal-skipped: the ts floor moved
    merged = _final(parent)
    assert merged["ts"][0].as_py() == t(30)

    # idempotent: re-merge is now a visible no-op
    r2 = merge_back(parent, branch)
    assert r2["applied"] == 0 and r2["epoch"] is None

    # an intermediate-ts parent event must LOSE against the merged floor
    write_segments(
        _event(3, t(20), "update", "c1", 0, role="user",
               text="intermediate", tool=""),
        chg, seg_rows=10, start_seg=1,
    )
    replay(ReplayConfig(changes_dir=chg, lake_dir=parent, num_partitions=4))
    fin = _final(parent)
    assert fin.num_rows == 1
    assert fin["text"][0].as_py() == "same"
    assert fin["ts"][0].as_py() == t(30)
