"""M3: exactly-once semantics under re-runs, crashes and dirty limits
(SURVEY.md §5.3/§5.5)."""

import os

import pyarrow as pa

import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import DirtyLimitExceeded, ReplayConfig, replay, run_epoch
from datax_ray.sinks.lake import final_table
from datax_ray.sources.changelog import plan_epochs
from datax_ray.state.manifest import Manifest
from tests.test_replay_e2e import assert_tables_equal


def _setup(tmp_path, tag, **knobs):
    changes = gen_changes(4000, 50, seed=11, **knobs)
    chg = str(tmp_path / f"c_{tag}")
    lake = str(tmp_path / f"l_{tag}")
    write_segments(changes, chg, seg_rows=1000)
    return changes, chg, lake


def test_double_replay_is_noop(tmp_path):
    changes, chg, lake = _setup(tmp_path, "dbl", dup_frac=0.05)
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4)
    r1 = replay(cfg)
    assert r1
    first = final_table(lake)
    r2 = replay(cfg)  # everything committed -> no epochs
    assert r2 == []
    assert_tables_equal(final_table(lake), first)
    assert_tables_equal(first, sequential_replay(changes))


def test_crash_before_commit_then_resume(tmp_path):
    """Kill the job after partition files are written but before the manifest
    commit; the re-run must converge to the oracle with no dupes."""
    changes, chg, lake = _setup(tmp_path, "crash", out_of_order_frac=0.1)
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4, segments_per_epoch=2)
    manifest = Manifest(lake)

    epochs = plan_epochs(chg, manifest, cfg.segments_per_epoch)
    assert len(epochs) == 2

    # run epoch 0 normally
    run_epoch(cfg, manifest, epochs[0], 0)

    # epoch 1: simulate crash at the commit point
    real_commit = Manifest.commit

    def exploding_commit(self, *a, **k):
        raise RuntimeError("injected crash before commit")

    Manifest.commit = exploding_commit
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            run_epoch(cfg, manifest, epochs[1], 1)
    finally:
        Manifest.commit = real_commit

    # lake still reads as epoch-0 state (orphan files invisible)
    assert manifest.committed_epoch() == 0

    # resume: same entry point replays only the uncommitted tail
    reports = replay(cfg)
    assert len(reports) == 1 and reports[0].epoch == 1
    assert_tables_equal(final_table(lake), sequential_replay(changes))


def test_duplicate_delivery_idempotent_files(tmp_path):
    """Re-running a committed epoch's merge (simulating a retried task /
    duplicate batch delivery) rewrites byte-identical partition files."""
    changes, chg, lake = _setup(tmp_path, "idem")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4)
    replay(cfg)
    m = Manifest(lake)
    files = m.current_files()
    before = {f: open(f, "rb").read() for f in files}

    # wipe the manifest and replay from scratch: files must come out identical
    import shutil

    shutil.rmtree(os.path.join(lake, "_manifest"))
    replay(cfg)
    for f, blob in before.items():
        assert open(f, "rb").read() == blob, f"non-deterministic rewrite: {f}"


def test_dirty_limit_aborts_before_commit(tmp_path):
    changes, chg, lake = _setup(tmp_path, "limit", corrupt_frac=0.2)
    cfg = ReplayConfig(
        changes_dir=chg, lake_dir=lake, num_partitions=4, error_limit_rows=10
    )
    with pytest.raises(DirtyLimitExceeded):
        replay(cfg)
    # nothing committed -> lake empty, job retryable
    assert Manifest(lake).committed_epoch() == -1
    ok = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4)
    replay(ok)
    assert_tables_equal(final_table(lake), sequential_replay(changes))


def test_deadletter_rows_recorded(tmp_path):
    changes, chg, lake = _setup(tmp_path, "dl", corrupt_frac=0.1)
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4)
    reports = replay(cfg)
    dirty = sum(r.dirty_rows for r in reports)
    assert dirty > 0
    import glob

    import pyarrow.dataset as pads

    dl_files = glob.glob(os.path.join(lake, "_deadletter", "**", "*.parquet"), recursive=True)
    assert dl_files
    dl = pads.dataset(dl_files).to_table()
    assert dl.num_rows == dirty
    assert dl["reason"].null_count == 0


def test_export_roundtrip_all_formats(tmp_path):
    """Lake -> {parquet,csv,jsonl} export; parquet re-read equals
    final_table; csv/jsonl preserve row counts and null-vs-empty strings."""
    import pyarrow.dataset as pads

    from datax_ray.sinks.export import export_lake

    changes, chg, lake = _setup(tmp_path, "exp")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4))
    want = final_table(lake)

    pdir = str(tmp_path / "exp_parquet")
    n = export_lake(lake, pdir, fmt="parquet")
    assert n == want.num_rows
    got = pads.dataset(pdir).to_table()
    got = got.take(
        pa.compute.sort_indices(
            got, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    ).select(want.column_names)
    assert got.equals(want)

    for fmt in ("csv", "jsonl"):
        out = str(tmp_path / f"exp_{fmt}")
        assert export_lake(lake, out, fmt=fmt) == want.num_rows
        files = os.listdir(out)
        assert files and all(f.endswith(f".{fmt}") for f in files)

    # Re-export is a TRUE overwrite: a stale file from a prior run of a
    # since-changed lake must not survive alongside the new part files.
    stale = os.path.join(pdir, "part-stale.parquet")
    with open(stale, "wb") as f:
        f.write(b"junk")
    assert export_lake(lake, pdir, fmt="parquet") == want.num_rows
    assert not os.path.exists(stale)
    got2 = pads.dataset(pdir).to_table()
    assert got2.num_rows == want.num_rows


def test_force_compaction_preserves_state(tmp_path):
    """compact_lake folds every pending fragment into bases; the merged
    view is unchanged, and a fresh compact is a no-op."""
    from datax_ray.pipelines.replay import compact_lake

    changes, chg, lake = _setup(tmp_path, "fc")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4)
    replay(cfg)
    before = final_table(lake)
    out = compact_lake(cfg)
    assert out["compacted_ranges"] > 0
    m = Manifest(lake)
    assert all(not v.get("frags") for v in m.current_ranges().values())
    assert_tables_equal(final_table(lake), before)
    assert compact_lake(cfg)["compacted_ranges"] == 0
    # replay remains up-to-date afterwards (no segment re-processing)
    assert replay(cfg) == []


def test_sigkill_mid_replay_then_resume(tmp_path):
    """Hard-crash realism: run replay in a separate OS process (its own Ray
    cluster), SIGKILL the whole process group after the first epoch commits
    but before the job finishes, then resume in-process — the lake must
    equal the oracle exactly (no duplicates from the killed epoch's orphan
    files, no losses)."""
    import signal
    import subprocess
    import sys
    import time

    changes = gen_changes(60_000, 800, seed=77, out_of_order_frac=0.1, dup_frac=0.02)
    chg = str(tmp_path / "chg_kill")
    lake = str(tmp_path / "lake_kill")
    write_segments(changes, chg, seg_rows=6_000)  # 10 segments => 10 epochs

    proc = subprocess.Popen(
        [sys.executable, "-m", "datax_ray", "replay", "--changes", chg,
         "--lake", lake, "--partitions", "8", "--segments-per-epoch", "1",
         "--num-cpus", "2"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True, cwd="/root/repo",
    )
    m = Manifest(lake)
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if m.committed_epoch() >= 1:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        assert m.committed_epoch() >= 1, "subprocess never committed an epoch"
        assert proc.poll() is None, "replay finished before we could kill it"
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(timeout=30)

    killed_at = m.committed_epoch()
    assert killed_at < 9, "kill landed after the job finished; nothing to resume"
    # resume in the session-scoped Ray cluster: same entry point
    reports = replay(ReplayConfig(changes_dir=chg, lake_dir=lake,
                                  num_partitions=8, segments_per_epoch=1))
    assert reports and reports[0].epoch == killed_at + 1
    assert_tables_equal(final_table(lake), sequential_replay(changes))


def test_time_travel_and_vacuum(tmp_path):
    """AS-OF reads reconstruct every committed epoch's exact state from
    retained manifests; vacuum drops history (old manifests + unreferenced
    files) without disturbing the latest state."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pytest as _pytest

    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.oracle import sequential_replay
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.state.manifest import Manifest

    chg_dir = str(tmp_path / "chg_tt")
    lake_dir = str(tmp_path / "lake_tt")
    changes = gen_changes(3000, 80, seed=31, out_of_order_frac=0.1, dup_frac=0.02)
    write_segments(changes, chg_dir, seg_rows=1000)
    replay(
        ReplayConfig(
            changes_dir=chg_dir, lake_dir=lake_dir, num_partitions=16,
            segments_per_epoch=1,
        )
    )
    segs = sorted(glob.glob(os.path.join(chg_dir, "*.parquet")))
    n_epochs = Manifest(lake_dir).committed_epoch() + 1
    assert n_epochs == len(segs) >= 3

    from tests.test_replay_e2e import assert_tables_equal

    for k in range(n_epochs):
        prefix = pa.concat_tables([pq.read_table(s) for s in segs[: k + 1]])
        assert_tables_equal(
            final_table(lake_dir, as_of_epoch=k), sequential_replay(prefix)
        )

    # vacuum to latest only: old manifests + now-unreferenced files go away
    out = Manifest(lake_dir).vacuum(keep_epochs=1)
    assert out["manifests_removed"] == n_epochs - 1
    assert out["epochs_kept"] == [n_epochs - 1]
    # latest state is untouched
    assert_tables_equal(final_table(lake_dir), sequential_replay(changes))
    # dropped history is an explicit error, not a silent empty read
    with _pytest.raises(ValueError, match="vacuum"):
        final_table(lake_dir, as_of_epoch=0)


def test_tagged_epoch_survives_vacuum(tmp_path):
    """A named tag pins its epoch through vacuum (manifest AND data
    files) — the durable-savepoint contract; deleting the tag releases
    the pin on the next vacuum."""
    import pytest as _pytest

    changes, chg, lake = _setup(tmp_path, "tags")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4,
                        segments_per_epoch=1))
    m = Manifest(lake)
    assert m.committed_epoch() >= 2
    want0 = final_table(lake, as_of_epoch=0)
    assert m.set_tag("release", 0) == 0
    assert m.tags() == {"release": 0}

    out = m.vacuum(keep_epochs=1)
    assert 0 in out["epochs_kept"]  # pinned by the tag
    assert 1 not in out["epochs_kept"]  # untagged history dropped
    assert_tables_equal(final_table(lake, as_of_epoch=0), want0)
    # as_of floor semantics: epoch 1's record is gone, so as_of=1 serves
    # the largest retained record below it (the tagged epoch 0)
    assert_tables_equal(final_table(lake, as_of_epoch=1), want0)
    # latest state still intact
    assert_tables_equal(final_table(lake), sequential_replay(changes))

    assert m.delete_tag("release")
    m.vacuum(keep_epochs=1)
    with _pytest.raises(ValueError, match="vacuum"):
        final_table(lake, as_of_epoch=0)  # pin released

    with _pytest.raises(ValueError, match="unknown tag"):
        m.resolve_tag("nope")
    with _pytest.raises(ValueError, match="not committed"):
        m.set_tag("bad", 999)  # can't tag an uncommitted epoch


def test_time_based_retention(tmp_path):
    """vacuum(older_than_s=...): keep records committed within the window;
    the head always survives regardless of age, tagged epochs stay
    pinned, and a generous window keeps everything."""
    import json as _json
    import time as _time

    import pytest as _pytest

    changes, chg, lake = _setup(tmp_path, "tret")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4,
                        segments_per_epoch=1))
    m = Manifest(lake)
    assert m.committed_epoch() >= 2
    # a generous window keeps all history
    out = m.vacuum(older_than_s=3600)
    assert len(out["epochs_kept"]) == m.committed_epoch() + 1

    # age epoch 0 artificially (rewrite its committed_at far in the past)
    files = dict(m._epoch_files())
    rec0 = _json.load(open(files[0]))
    rec0["committed_at"] = _time.time() - 10_000
    with open(files[0], "w") as f:
        _json.dump(rec0, f)
    m.set_tag("pin1", 1)  # pin epoch 1 by tag
    rec1 = _json.load(open(files[1]))
    rec1["committed_at"] = _time.time() - 10_000
    with open(files[1], "w") as f:
        _json.dump(rec1, f)

    out = m.vacuum(older_than_s=3600)
    assert 0 not in out["epochs_kept"]       # aged out
    assert 1 in out["epochs_kept"]           # old but tagged
    assert m.committed_epoch() in out["epochs_kept"]  # head survives
    with _pytest.raises(ValueError, match="vacuum"):
        final_table(lake, as_of_epoch=0)
    assert_tables_equal(final_table(lake), sequential_replay(changes))


def test_concurrent_commit_raises_not_clobbers(tmp_path):
    """Two drivers racing the same epoch: one winner, one loud error —
    the winner's record is never silently overwritten."""
    import pytest

    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.state.manifest import ConcurrentCommitError, Manifest

    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_segments(gen_changes(1000, 20, seed=88), chg, seg_rows=500)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4))

    m = Manifest(lake)
    winner = m.latest()
    with pytest.raises(ConcurrentCommitError):
        m.commit(
            m.committed_epoch(),  # same epoch as the winner
            segments=["seg-imposter.parquet"],
            lsn_hi=m.committed_lsn_hi(),
            schema=m.committed_schema(),
            partitions={},
            ranges={},
            layout=m.committed_layout(),
            lineage=[],
            metrics={},
        )
    assert m.latest() == winner  # record unchanged


def test_concurrent_commit_rebase_retries(tmp_path, monkeypatch):
    """A replay that LOSES an epoch commit race re-plans from the winner's
    committed state and finishes the remaining segments (optimistic
    rebase) — final lake equals the oracle, no manual resume needed."""
    import datax_ray.pipelines.replay as rp
    from datax_ray.state.manifest import ConcurrentCommitError

    changes, chg, lake = _setup(tmp_path, "rebase")
    real = rp.run_epoch
    state = {"raced": False}

    def racing(cfg, manifest, segments, epoch):
        # epoch 0: a competing writer wins an IDENTICAL commit just before
        # ours lands — simulate by letting the commit happen (that's the
        # winner's record) and then surfacing the loser's error
        out = real(cfg, manifest, segments, epoch)
        if not state["raced"]:
            state["raced"] = True
            raise ConcurrentCommitError("simulated lost race")
        return out

    monkeypatch.setattr(rp, "run_epoch", racing)
    rp.replay(
        ReplayConfig(
            changes_dir=chg, lake_dir=lake, num_partitions=4,
            segments_per_epoch=1,
        )
    )
    assert state["raced"]
    assert_tables_equal(final_table(lake), sequential_replay(changes))

    # a loser that can never win (its commits never land) gives up loudly
    # after max_commit_retries rather than spinning
    chg2, lake2 = str(tmp_path / "c_r2"), str(tmp_path / "l_r2")
    write_segments(gen_changes(500, 10, seed=5), chg2, seg_rows=500)

    def always_loses(cfg, manifest, segments, epoch):
        raise ConcurrentCommitError("pathological loser")

    monkeypatch.setattr(rp, "run_epoch", always_loses)
    with pytest.raises(ConcurrentCommitError):
        rp.replay(
            ReplayConfig(changes_dir=chg2, lake_dir=lake2, num_partitions=4),
            max_commit_retries=2,
        )


def test_two_writers_race_one_lake(tmp_path):
    """TWO replays of the same change log race one lake concurrently
    (threads, real interleaving): exclusive commits make one winner per
    epoch, losers rebase, stale-plan double-applied segments fold
    idempotently under LWW — both writers finish and the lake equals the
    oracle. The multi-writer safety story end to end."""
    import threading

    changes, chg, lake = _setup(tmp_path, "race2")
    cfg = ReplayConfig(
        changes_dir=chg, lake_dir=lake, num_partitions=4, segments_per_epoch=1
    )
    errors: list[BaseException] = []

    def run():
        try:
            replay(cfg, max_commit_retries=10)
        except BaseException as e:  # surfaced in the main thread below
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert_tables_equal(final_table(lake), sequential_replay(changes))
    # and every source segment is committed exactly as planned
    m = Manifest(lake)
    assert len(m.committed_segments()) == 4


def test_export_partitioned_hive_layout(tmp_path):
    """partition_by writes out/<col>=<val>/part-*.ext with partition
    columns dropped from file content; a Hive-aware reader restores them
    and the full table round-trips. ORC export round-trips too."""
    import pyarrow.dataset as pads

    from datax_ray.sinks.export import export_lake

    changes, chg, lake = _setup(tmp_path, "exph")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4))
    want = final_table(lake)

    out = str(tmp_path / "exp_hive")
    n = export_lake(lake, out, fmt="parquet", partition_by=["role"])
    assert n == want.num_rows
    roles = sorted(d for d in os.listdir(out) if d.startswith("role="))
    assert roles == sorted(
        f"role={r}" for r in set(want["role"].to_pylist())
    )
    # files inside a partition dir must NOT carry the partition column
    import pyarrow.parquet as pq

    first = next(
        os.path.join(out, roles[0], f)
        for f in os.listdir(os.path.join(out, roles[0]))
        if f.endswith(".parquet")
    )
    assert "role" not in pq.read_schema(first).names
    got = pads.dataset(out, partitioning="hive").to_table()
    got = got.take(
        pa.compute.sort_indices(
            got, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    ).select(want.column_names)
    # hive partitioning reads role back as dictionary/string — normalize
    got = got.set_column(
        got.schema.get_field_index("role"),
        "role",
        got["role"].cast(pa.string()),
    )
    assert got.equals(want)

    # ORC single-dir export round-trips (ns->us normalize on read)
    oout = str(tmp_path / "exp_orc")
    assert export_lake(lake, oout, fmt="orc") == want.num_rows
    from datax_ray.sources.orcsource import read_orc

    back = pa.Table.from_pylist(read_orc(oout).take_all())
    assert back.num_rows == want.num_rows
