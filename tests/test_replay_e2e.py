"""M2/M3: distributed replay == sequential oracle, across knob combinations."""

import pyarrow as pa
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def assert_tables_equal(ours: pa.Table, oracle: pa.Table):
    assert ours.schema.equals(oracle.schema), f"\nours={ours.schema}\noracle={oracle.schema}"
    assert ours.num_rows == oracle.num_rows
    for name in oracle.column_names:
        a, b = ours[name], oracle[name]
        if not a.equals(b):
            # find first mismatch for a useful message
            av, bv = a.to_pylist(), b.to_pylist()
            for i, (x, y) in enumerate(zip(av, bv)):
                assert x == y, f"col {name} row {i}: {x!r} != {y!r}"
            pytest.fail(f"column {name} mismatch")


def run_case(tmp_path, tag, n_events=4000, n_convs=60, seg_rows=1500, partitions=8, **knobs):
    cfg_knobs = {}
    for k in ("segments_per_epoch", "salt_turn_width", "compact_every"):
        if k in knobs:
            cfg_knobs[k] = knobs.pop(k)
    changes = gen_changes(n_events, n_convs, seed=42, **knobs)
    chg_dir = str(tmp_path / f"chg_{tag}")
    lake_dir = str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg_dir, seg_rows=seg_rows)
    reports = replay(
        ReplayConfig(
            changes_dir=chg_dir,
            lake_dir=lake_dir,
            num_partitions=partitions,
            **cfg_knobs,
        )
    )
    assert reports, "no epochs ran"
    ours = final_table(lake_dir)
    oracle = sequential_replay(changes)
    assert_tables_equal(ours, oracle)
    return reports


def test_replay_basic(tmp_path):
    run_case(tmp_path, "basic")


def test_replay_out_of_order_and_dups(tmp_path):
    run_case(tmp_path, "ooo", out_of_order_frac=0.2, dup_frac=0.05)


def test_replay_multi_epoch(tmp_path):
    reports = run_case(tmp_path, "epochs", segments_per_epoch=1)
    assert len(reports) == 3  # 4000 rows / 1500 per segment


def test_replay_hot_keys_salted(tmp_path):
    run_case(
        tmp_path, "zipf", hot_key_zipf_s=1.5, salt_turn_width=4, partitions=8
    )


def test_replay_ddl(tmp_path):
    run_case(tmp_path, "ddl", with_ddl=True, segments_per_epoch=1)


def test_rename_and_drop_ddl_through_compaction(tmp_path):
    """rename_column + drop_column DDL mid-stream: the engine applies them
    at an epoch boundary, pre-DDL fragments remap/shed columns at
    merge-read via the schema's rename metadata, and forced compaction
    folds old-name fragments into new-schema bases — final state must
    equal the sequential oracle and expose ONLY the renamed column."""
    import pyarrow.compute as pc

    from datax_ray.schemas import CHANGES_SCHEMA

    import numpy as np

    changes = gen_changes(4000, 60, seed=42)
    # splice the DDL lsns contiguously at position 2500 (a later segment
    # carrying smaller lsns than a committed epoch's max would be dropped
    # by the watermark dedup — correct engine behavior, wrong test data)
    lsn = changes["lsn"].to_numpy(zero_copy_only=False)
    changes = changes.set_column(
        changes.schema.get_field_index("lsn"), "lsn",
        pa.array(np.where(lsn >= 2500, lsn + 2, lsn), pa.int64()),
    )
    ts0 = pc.min(changes["ts"])
    ddl = pa.table(
        {
            "lsn": pa.array([2500, 2501], pa.int64()),
            "ts": pa.array([ts0.as_py()] * 2, pa.timestamp("us")),
            "op": pa.array(["ddl", "ddl"]),
            "conv_id": pa.array([None, None], pa.string()),
            "turn_idx": pa.array([None, None], pa.int32()),
            "role": pa.array([None, None], pa.string()),
            "text": pa.array([None, None], pa.string()),
            "tool": pa.array([None, None], pa.string()),
            "ddl": pa.array(
                [
                    '{"action": "rename_column", "name": "role", "to": "speaker"}',
                    '{"action": "drop_column", "name": "tool"}',
                ],
                pa.string(),
            ),
        },
        schema=CHANGES_SCHEMA,
    )
    full = pa.concat_tables([changes.slice(0, 2500), ddl, changes.slice(2500)])
    chg_dir = str(tmp_path / "chg_rename")
    lake_dir = str(tmp_path / "lake_rename")
    write_segments(full, chg_dir, seg_rows=1500)
    replay(
        ReplayConfig(
            changes_dir=chg_dir,
            lake_dir=lake_dir,
            num_partitions=8,
            segments_per_epoch=1,
            compact_every=1,
        )
    )
    ours = final_table(lake_dir)
    assert "speaker" in ours.column_names
    assert "role" not in ours.column_names
    assert "tool" not in ours.column_names
    assert_tables_equal(ours, sequential_replay(full))


def test_replay_dirty(tmp_path):
    reports = run_case(tmp_path, "dirty", corrupt_frac=0.05)
    assert sum(r.dirty_rows for r in reports) > 0


def test_replay_everything(tmp_path):
    run_case(
        tmp_path,
        "all",
        n_events=6000,
        out_of_order_frac=0.15,
        dup_frac=0.03,
        corrupt_frac=0.03,
        hot_key_zipf_s=1.2,
        with_ddl=True,
        segments_per_epoch=2,
        salt_turn_width=8,
    )


def test_compaction_matches_oracle(tmp_path):
    """compact_every=2 with per-segment epochs: bases get rewritten while
    deltas accumulate and fold, and the merged view still equals the
    sequential oracle."""
    from datax_ray.state.manifest import Manifest

    reports = run_case(
        tmp_path,
        "compact",
        n_events=6000,
        seg_rows=1000,
        segments_per_epoch=1,
        compact_every=2,
    )
    assert len(reports) == 6
    lake_dir = str(tmp_path / "lake_compact")
    m = Manifest(lake_dir)
    parts = m.current_partitions()
    ranges = m.current_ranges()
    assert any(v.get("base") for v in parts.values()), "no compaction happened"
    # compaction triggers on COMMITTED epochs (so it can overlap the delta
    # stage): at most compact_every epochs of fragments are ever pending
    assert all(len(v.get("epochs", [])) <= 2 for v in ranges.values())


def test_tombstone_survives_compaction(tmp_path):
    """delete (late ts) in epoch 1, stale update (older ts) in epoch 3 after
    a compaction: the row must stay deleted — tombstones carry (ts, _lsn)
    through compaction."""
    import numpy as np

    from datax_ray.oracle import sequential_replay
    from datax_ray.sinks.lake import final_table

    base_us = 1_767_225_600_000_000
    rows = [
        # epoch 0: insert
        (0, base_us + 1_000, "insert", "conv-x", 1, "user", "hello", ""),
        # epoch 1: delete with LATE ts
        (1, base_us + 9_000, "delete", "conv-x", 1, None, None, None),
        # epoch 2: unrelated traffic so compact_every=2 fires before epoch 3
        (2, base_us + 10_000, "insert", "conv-y", 1, "user", "other", ""),
        # epoch 3: stale update (ts older than tombstone, lsn newer)
        (3, base_us + 5_000, "update", "conv-x", 1, "user", "resurrect?", ""),
    ]
    t = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "op": pa.array([r[2] for r in rows], pa.string()),
            "conv_id": pa.array([r[3] for r in rows], pa.string()),
            "turn_idx": pa.array([r[4] for r in rows], pa.int32()),
            "role": pa.array([r[5] for r in rows], pa.string()),
            "text": pa.array([r[6] for r in rows], pa.string()),
            "tool": pa.array([r[7] for r in rows], pa.string()),
            "ddl": pa.array([None] * len(rows), pa.string()),
        }
    )
    chg = str(tmp_path / "chg_tomb")
    lake = str(tmp_path / "lake_tomb")
    write_segments(t, chg, seg_rows=1)
    replay(
        ReplayConfig(
            changes_dir=chg,
            lake_dir=lake,
            num_partitions=4,
            segments_per_epoch=1,
            compact_every=2,
        )
    )
    ours = final_table(lake)
    assert_tables_equal(ours, sequential_replay(t))
    assert ours.num_rows == 1  # only conv-y survives
    assert ours["conv_id"][0].as_py() == "conv-y"


def test_bootstrap_then_replay_matches_oracle(tmp_path):
    """Snapshot full-load (epoch 0) + incremental change replay equals the
    sequential oracle seeded with the same snapshot — including events
    whose ts is older than the snapshot row they target (snapshot wins)."""
    import pyarrow.parquet as pq

    from datax_ray.fixtures.generator import gen_transcripts
    from datax_ray.pipelines.bootstrap import bootstrap

    base = gen_transcripts(n_convs=60, seed=9, mean_turns=10)
    src = str(tmp_path / "snapshot.parquet")
    pq.write_table(base, src)
    changes = gen_changes(3000, 60, seed=10, out_of_order_frac=0.2, dup_frac=0.02)
    chg = str(tmp_path / "chg_boot")
    lake = str(tmp_path / "lake_boot")
    write_segments(changes, chg, seg_rows=1000)

    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                       segments_per_epoch=1, compact_every=2)
    rep0 = bootstrap(src, cfg)
    assert rep0.rows_out == base.num_rows and rep0.dirty_rows == 0
    replay(cfg)
    assert_tables_equal(
        final_table(lake), sequential_replay(changes, base=base)
    )


def test_bootstrap_requires_empty_lake(tmp_path):
    import pyarrow.parquet as pq

    from datax_ray.fixtures.generator import gen_transcripts
    from datax_ray.pipelines.bootstrap import bootstrap

    src = str(tmp_path / "snap.parquet")
    pq.write_table(gen_transcripts(n_convs=5, seed=1), src)
    lake = str(tmp_path / "lake_dbl")
    cfg = ReplayConfig(changes_dir="", lake_dir=lake, num_partitions=4)
    bootstrap(src, cfg)
    with pytest.raises(RuntimeError):
        bootstrap(src, cfg)


def test_heterogeneous_segment_formats(tmp_path):
    """One change log split across parquet + jsonl + csv segments replays
    to the same oracle state (the DataX heterogeneous-reader matrix)."""
    import json as _json
    import os

    import pyarrow.csv as pacsv

    changes = gen_changes(3000, 50, seed=21, out_of_order_frac=0.1)
    chg = str(tmp_path / "chg_mixed")
    os.makedirs(chg)
    third = changes.num_rows // 3
    a, b, c = (
        changes.slice(0, third),
        changes.slice(third, third),
        changes.slice(2 * third),
    )
    import pyarrow.parquet as pq

    pq.write_table(a, f"{chg}/seg-00000.parquet")
    with open(f"{chg}/seg-00001.jsonl", "w") as f:
        for r in b.to_pylist():
            r["ts"] = r["ts"].isoformat()
            f.write(_json.dumps(r) + "\n")
    # CSV null convention: \\N (empty field = empty string)
    c.to_pandas().to_csv(f"{chg}/seg-00002.csv", index=False, na_rep="\\N")

    lake = str(tmp_path / "lake_mixed")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    assert_tables_equal(final_table(lake), sequential_replay(changes))


def test_salting_flattens_hot_ranges(tmp_path):
    """With zipf-1.8 hot conversations, turn-salted partitioning must cut
    the max-range/mean-range row ratio materially vs unsalted (the
    explicit skew handling the north rule requires)."""
    from datax_ray.state.manifest import Manifest

    changes = gen_changes(20_000, 500, seed=33, hot_key_zipf_s=1.8, max_turns=40)
    chg = str(tmp_path / "chg_skew")
    write_segments(changes, chg, seg_rows=20_000)

    def ratio(salt):
        lake = str(tmp_path / f"lake_salt_{salt}")
        replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=32,
                            salt_turn_width=salt))
        rows = [v["rows"] for v in Manifest(lake).current_ranges().values() if v["rows"]]
        return max(rows) / (sum(rows) / len(rows))

    unsalted, salted = ratio(None), ratio(4)
    assert salted < unsalted * 0.8, (unsalted, salted)
    # and correctness is unaffected by salting
    lake = str(tmp_path / "lake_salt_4")
    assert_tables_equal(final_table(lake), sequential_replay(changes))


def test_ddl_then_compaction(tmp_path):
    """Schema evolution (add column + widen) with compaction every other
    epoch: compacted bases adopt the evolved schema, pre-DDL files unify on
    read, and the whole lake equals the oracle."""
    run_case(
        tmp_path,
        "ddlcompact",
        n_events=6000,
        seg_rows=1000,
        segments_per_epoch=1,
        compact_every=2,
        with_ddl=True,
    )


def test_incremental_mv_refresh(tmp_path):
    """MV refresh recomputes only ranges whose committed file set changed:
    first refresh computes all, an idempotent re-refresh skips all, a second
    small epoch (few convs) refreshes a strict subset — and after every
    refresh the folded MV equals the aggregate of the final lake."""
    import collections

    import pyarrow.compute as pc

    from datax_ray.pipelines.mv import read_mv, refresh_mv

    chg_dir = str(tmp_path / "chg_mv")
    lake_dir = str(tmp_path / "lake_mv")
    mv_dir = str(tmp_path / "mv")

    big = gen_changes(4000, 120, seed=11)
    write_segments(big, chg_dir, seg_rows=2000)
    replay(ReplayConfig(changes_dir=chg_dir, lake_dir=lake_dir, num_partitions=32))

    r1 = refresh_mv(lake_dir, mv_dir)
    assert r1["refreshed"] > 0 and r1["skipped"] == 0

    r2 = refresh_mv(lake_dir, mv_dir)  # nothing committed since
    assert r2["refreshed"] == 0 and r2["skipped"] == r1["refreshed"]

    def mv_equals_lake():
        lake = final_table(lake_dir)
        want = collections.Counter(lake["conv_id"].to_pylist())
        got_rows = read_mv(mv_dir).take_all()
        got = {r["conv_id"]: r["n_turns"] for r in got_rows}
        assert got == dict(want)
        # last_ts: max ts per conv
        want_ts = {}
        for conv, ts in zip(lake["conv_id"].to_pylist(), lake["ts"].to_pylist()):
            if conv not in want_ts or ts > want_ts[conv]:
                want_ts[conv] = ts
        got_ts = {r["conv_id"]: r["last_ts"] for r in got_rows}
        assert got_ts == want_ts

    mv_equals_lake()

    # small tail epoch touching few convs: shift lsn/ts past the first batch
    small = gen_changes(300, 3, seed=12)
    shift = 4000
    small = small.set_column(
        small.schema.get_field_index("lsn"), "lsn", pc.add(small["lsn"], shift)
    )
    small = small.set_column(
        small.schema.get_field_index("ts"),
        "ts",
        pc.cast(
            pc.add(pc.cast(small["ts"], pa.int64()), shift * 1_000),
            pa.timestamp("us"),
        ),
    )
    import pyarrow.parquet as pq
    import os

    pq.write_table(small, os.path.join(chg_dir, f"seg-{shift:012d}.parquet"))
    replay(ReplayConfig(changes_dir=chg_dir, lake_dir=lake_dir, num_partitions=32))

    r3 = refresh_mv(lake_dir, mv_dir)
    assert r3["refreshed"] > 0, "tail epoch must dirty some ranges"
    assert r3["skipped"] > 0, "tail epoch touching 3 convs must leave ranges untouched"
    mv_equals_lake()


def test_tail_catches_up_with_live_segments(tmp_path):
    """Tail loop: segments landing WHILE the tailer polls are picked up as
    incremental epochs, and the final lake equals the sequential oracle
    over the full (initial + late) change stream."""
    import os
    import threading

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from datax_ray.pipelines.replay import tail

    chg_dir = str(tmp_path / "chg_tail")
    lake_dir = str(tmp_path / "lake_tail")

    first = gen_changes(2000, 50, seed=21)
    write_segments(first, chg_dir, seg_rows=1000)

    late = gen_changes(600, 50, seed=22)
    shift = 2000
    late = late.set_column(
        late.schema.get_field_index("lsn"), "lsn", pc.add(late["lsn"], shift)
    )
    late = late.set_column(
        late.schema.get_field_index("ts"),
        "ts",
        pc.cast(
            pc.add(pc.cast(late["ts"], pa.int64()), shift * 1_000), pa.timestamp("us")
        ),
    )

    def land_late():
        pq.write_table(late, os.path.join(chg_dir, f"seg-{shift:012d}.parquet"))

    t = threading.Timer(0.5, land_late)
    t.start()
    try:
        reports = tail(
            ReplayConfig(changes_dir=chg_dir, lake_dir=lake_dir, num_partitions=16),
            poll_interval_s=0.3,
            idle_exit=4,
        )
    finally:
        t.join()
    assert len(reports) >= 2, "initial batch and late segment must replay separately"

    both = pa.concat_tables([first, late])
    assert_tables_equal(final_table(lake_dir), sequential_replay(both))


def _build_lookup_lake(tmp_path, tag, salt_turn_width=None):
    changes = gen_changes(3000, 40, seed=7)
    chg_dir = str(tmp_path / f"chg_{tag}")
    lake_dir = str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg_dir, seg_rows=1500)
    replay(
        ReplayConfig(
            changes_dir=chg_dir,
            lake_dir=lake_dir,
            num_partitions=16,
            salt_turn_width=salt_turn_width,
        )
    )
    return lake_dir


def test_point_lookup_prunes_and_matches(tmp_path):
    """read_lake(conv_ids=...) must plan strictly fewer ranges (unsalted
    layout) and return exactly the full read filtered to those keys."""
    import pyarrow.compute as pc

    from datax_ray.sinks.lake import LakeDatasource, read_lake

    lake = _build_lookup_lake(tmp_path, "lookup")
    full = final_table(lake)
    keys = sorted(set(full["conv_id"].to_pylist()))[:3]

    pruned = LakeDatasource(lake, conv_ids=keys)
    everything = LakeDatasource(lake)
    assert len(pruned._parts) < len(everything._parts)

    got = (
        read_lake(lake, conv_ids=keys)
        .sort(["conv_id", "turn_idx"])
        .take_all()
    )
    want = (
        full.filter(pc.is_in(full["conv_id"], value_set=pa.array(keys)))
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .to_pylist()
    )
    assert got == want


def test_point_lookup_salted_layout_prunes_by_salt_enumeration(tmp_path):
    """With salt_turn_width set a key's rows spread across partitions by
    turn_idx // W — but the manifest's global turn bounds bound the salt
    value set, so the plan prunes to the enumerated candidate ranges and
    the row filter stays exact."""
    import pyarrow.compute as pc

    from datax_ray.sinks.lake import LakeDatasource, read_lake
    from datax_ray.stages.partitioning import part_ids_for
    from datax_ray.state.manifest import Manifest

    lake = _build_lookup_lake(tmp_path, "lookup_salt", salt_turn_width=4)
    full = final_table(lake)
    keys = sorted(set(full["conv_id"].to_pylist()))[:2]

    pruned = LakeDatasource(lake, conv_ids=keys)
    everything = LakeDatasource(lake)
    assert len(pruned._parts) <= len(everything._parts)

    # the pruned plan must cover every range that actually holds the keys
    m = Manifest(lake)
    layout = m.committed_layout()
    P = int(layout["num_partitions"])
    ppr = max(1, P // int(layout.get("frag_ranges", 1) or 1))
    rows = full.filter(pc.is_in(full["conv_id"], value_set=pa.array(keys)))
    true_pids = part_ids_for(
        rows["conv_id"], rows["turn_idx"], P, int(layout["salt_turn_width"])
    ).to_pylist()
    need_rids = {pid // ppr for pid in true_pids}
    assert need_rids <= {p["range_id"] for p in pruned._parts}

    got = (
        read_lake(lake, conv_ids=keys)
        .sort(["conv_id", "turn_idx"])
        .take_all()
    )
    want = (
        full.filter(pc.is_in(full["conv_id"], value_set=pa.array(keys)))
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .to_pylist()
    )
    assert got == want


def test_point_lookup_salted_strict_prune_and_fallback(tmp_path):
    """A wide salted layout with a narrow turn span must prune STRICTLY
    (few salts => few candidate pids), and a pre-upgrade manifest
    (no turn bounds) must fall back to the unpruned-but-exact plan."""
    import json as _json
    import os

    from pyarrow import compute as _pc

    from datax_ray.sinks.lake import LakeDatasource, read_lake
    from datax_ray.state.manifest import Manifest

    changes = gen_changes(4000, 120, seed=11, max_turns=8)
    chg_dir, lake = str(tmp_path / "chg_sp"), str(tmp_path / "lake_sp")
    write_segments(changes, chg_dir, seg_rows=2000)
    replay(
        ReplayConfig(
            changes_dir=chg_dir, lake_dir=lake,
            num_partitions=64, salt_turn_width=4,
        )
    )
    m = Manifest(lake)
    lo, hi = m.committed_turn_bounds()
    assert lo is not None and 0 <= lo <= hi < 8

    full = final_table(lake)
    key = sorted(set(full["conv_id"].to_pylist()))[0]
    pruned = LakeDatasource(lake, conv_ids=[key])
    everything = LakeDatasource(lake)
    assert len(pruned._parts) < len(everything._parts)  # strict pruning

    want = full.filter(_pc.equal(full["conv_id"], key)).num_rows
    assert read_lake(lake, conv_ids=[key]).count() == want
    # count() must EXECUTE the merge, not trust planner metadata (stored
    # rows are pre-merge: LWW folding + tombstones shrink the output)
    assert read_lake(lake).count() == full.num_rows

    # simulate a pre-upgrade manifest: drop the turn bounds in place.
    # Per-file key blooms (state/bloom.py) still prune FILES within the
    # unrouted plan, so turn-bound-less is no longer unpruned — only
    # strictly-wider than the routed plan, and still exact.
    mfile = sorted(
        os.path.join(lake, "_manifest", f)
        for f in os.listdir(os.path.join(lake, "_manifest"))
    )[-1]
    rec = _json.load(open(mfile))
    rec.pop("turn_lo"), rec.pop("turn_hi")
    os.chmod(mfile, 0o644)
    _json.dump(rec, open(mfile, "w"))
    legacy = LakeDatasource(lake, conv_ids=[key])
    assert len(legacy._parts) >= len(pruned._parts)
    assert read_lake(lake, conv_ids=[key]).count() == want  # still exact

    # fully pre-upgrade: no turn bounds AND no blooms => no pruning at all
    rec = _json.load(open(mfile))
    for v in rec.get("partitions", {}).values():
        v.pop("bloom", None)
    for v in rec.get("ranges", {}).values():
        v.pop("frag_bloom", None)
    _json.dump(rec, open(mfile, "w"))
    legacy = LakeDatasource(lake, conv_ids=[key])
    assert len(legacy._parts) == len(everything._parts)  # no pruning
    assert read_lake(lake, conv_ids=[key]).count() == want  # still exact


def test_snapshot_isolation_reader_unaffected_by_commit(tmp_path):
    """A Dataset planned against epoch N must return epoch-N state even if
    a new epoch commits before it executes — manifests are immutable
    records and data files are never rewritten in place, so a pinned plan
    is a consistent snapshot (no read locks anywhere)."""
    from datax_ray.sinks.lake import read_lake
    from datax_ray.state.manifest import Manifest

    changes = gen_changes(3000, 50, seed=31)
    chg, lk = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1500)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    epoch_n = Manifest(lk).committed_epoch()
    pinned = read_lake(lk)  # plan built NOW, against epoch N
    want = final_table(lk, as_of_epoch=epoch_n).to_pylist()

    more = gen_changes(2000, 50, seed=32)
    import pyarrow.compute as _pc

    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn", _pc.add(more["lsn"], 500_000)
    )
    write_segments(more, chg, seg_rows=1000, start_seg=50)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    assert Manifest(lk).committed_epoch() > epoch_n

    got = sorted(
        pinned.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    assert got == want  # the new commit is invisible to the pinned plan
    # and a FRESH plan sees the new state
    assert read_lake(lk).count() == final_table(lk).num_rows


def test_point_lookup_missing_key_empty(tmp_path):
    from datax_ray.sinks.lake import read_lake

    lake = _build_lookup_lake(tmp_path, "lookup_miss")
    got = read_lake(lake, conv_ids=["conv-does-not-exist"]).take_all()
    assert got == []


def test_where_filter_post_merge_exact(tmp_path):
    """read_lake(where=...) equality filters apply POST-merge (predicates
    must see the LWW winner, not any losing version) and compose with
    point lookups."""
    import pyarrow.compute as _pc

    from datax_ray.sinks.lake import read_lake

    lake = _build_lookup_lake(tmp_path, "where")
    full = final_table(lake)

    for role in set(full["role"].to_pylist()):
        want = full.filter(_pc.equal(full["role"], role)).num_rows
        assert read_lake(lake, where={"role": role}).count() == want

    key = sorted(set(full["conv_id"].to_pylist()))[0]
    both = full.filter(
        _pc.and_(_pc.equal(full["conv_id"], key), _pc.equal(full["role"], "user"))
    ).num_rows
    assert (
        read_lake(lake, conv_ids=[key], where={"role": "user"}).count() == both
    )
