"""Online layout migration: state preservation, tombstone survival,
post-migration ingest under the new layout, pruning, and idempotence."""

import glob

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.repartition import repartition_lake
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table, read_lake
from datax_ray.state.manifest import Manifest


def _build(tmp_path, tag, salt_turn_width=None, n_events=4000, n_convs=60):
    changes = gen_changes(n_events, n_convs, seed=23, out_of_order_frac=0.15)
    chg = str(tmp_path / f"chg_{tag}")
    lake = str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg, seg_rows=1500)
    replay(ReplayConfig(
        changes_dir=chg, lake_dir=lake, num_partitions=8,
        salt_turn_width=salt_turn_width,
    ))
    return changes, chg, lake


@pytest.mark.parametrize("to_salt", [None, 4])
def test_repartition_preserves_state(tmp_path, to_salt):
    changes, _, lake = _build(tmp_path, f"mig{to_salt}", salt_turn_width=8)
    before = final_table(lake)

    rep = repartition_lake(lake, 20, salt_turn_width=to_salt)
    assert rep["changed"] and rep["rows_moved"] > 0

    m = Manifest(lake)
    layout = m.committed_layout()
    assert layout["num_partitions"] == 20
    assert layout.get("salt_turn_width") == to_salt

    after = final_table(lake)
    assert after.equals(before)
    assert after.equals(sequential_replay(changes))


def test_repartition_then_replay_uses_new_layout(tmp_path):
    """The key correctness risk of any layout change: NEW events after the
    migration must route to the same ranges as the migrated rows, or LWW
    never sees both versions of a key together."""
    import os

    changes, chg, lake = _build(tmp_path, "cont")
    repartition_lake(lake, 24, salt_turn_width=4)

    # More events for the SAME conversations land after the migration.
    more = gen_changes(3000, 60, seed=99, out_of_order_frac=0.1)
    lsn_off = int(pc.max(changes["lsn"]).as_py()) + 1
    more = more.set_column(
        0, "lsn", pc.add(more["lsn"], lsn_off)
    )
    import datetime
    ts_off = (
        pc.max(changes["ts"]).as_py() - pc.min(more["ts"]).as_py()
        + datetime.timedelta(seconds=1)
    )
    more = more.set_column(
        1, "ts",
        pc.add(more["ts"], pa.scalar(ts_off, pa.duration("us"))),
    )
    nseg = len(glob.glob(os.path.join(chg, "seg-*.parquet")))
    pq.write_table(more, os.path.join(chg, f"seg-{nseg + 100:09d}.parquet"))

    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    combined = pa.concat_tables([changes, more]).combine_chunks()
    assert final_table(lake).equals(sequential_replay(combined))

    # The replay honored the migrated layout, not its cfg.
    assert Manifest(lake).committed_layout()["num_partitions"] == 24


def test_repartition_tombstones_survive_migration(tmp_path):
    """A purged/deleted key's tombstone must move with the data, or a
    late stale event would resurrect it in the new layout."""
    import datetime
    import os

    from datax_ray.pipelines.purge import purge
    from datax_ray.schemas import CHANGES_SCHEMA

    changes, chg, lake = _build(tmp_path, "tomb")
    live = final_table(lake)
    conv = live["conv_id"][0].as_py()
    purge(lake, [conv])

    repartition_lake(lake, 16, salt_turn_width=2)

    row = live.filter(pc.equal(live["conv_id"], conv)).slice(0, 1)
    late = pa.Table.from_pylist(
        [{
            "lsn": int(pc.max(changes["lsn"]).as_py()) + 50,
            "ts": row["ts"][0].as_py() - datetime.timedelta(seconds=3600),
            "op": "update", "conv_id": conv,
            "turn_idx": row["turn_idx"][0].as_py(),
            "role": "user", "text": "resurrected?", "tool": "", "ddl": None,
        }],
        schema=CHANGES_SCHEMA,
    )
    pq.write_table(late, os.path.join(chg, "seg-000000777.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    after = final_table(lake)
    assert not pc.any(pc.equal(after["conv_id"], conv)).as_py()


def test_repartition_noop_and_time_travel(tmp_path):
    _, _, lake = _build(tmp_path, "noop")
    m = Manifest(lake)
    pre_epoch = m.committed_epoch()
    pre_state = final_table(lake)

    rep = repartition_lake(lake, 12)
    assert rep["changed"]
    # Same layout again -> no-op (also what a retried migration sees).
    rep2 = repartition_lake(lake, 12)
    assert not rep2["changed"] and rep2["epoch"] is None

    # Time travel to the pre-migration epoch still reads the OLD layout.
    import ray
    old = pa.concat_tables(
        [t for t in ray.get(
            read_lake(lake, as_of_epoch=pre_epoch).to_arrow_refs()
        ) if t.num_rows]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert old.equals(pre_state)

    # After vacuum the old-layout files are gone and history raises.
    m.vacuum(keep_epochs=1)
    with pytest.raises(ValueError):
        read_lake(lake, as_of_epoch=pre_epoch).count()
    assert final_table(lake).equals(pre_state)


def test_repartition_unsalting_restores_pruning(tmp_path):
    """Dropping the salt re-enables manifest point-lookup pruning."""
    from datax_ray.sinks.lake import LakeDatasource

    _, _, lake = _build(tmp_path, "prune", salt_turn_width=4)
    live = final_table(lake)
    conv = live["conv_id"][0].as_py()

    # Salted: pruning works by salt enumeration (bounded by the
    # manifest's global turn bounds) — never wider than the full plan.
    src_salted = LakeDatasource(lake, conv_ids=[conv])
    all_ranges = len(LakeDatasource(lake)._parts)
    assert len(src_salted._parts) <= all_ranges

    repartition_lake(lake, 16, salt_turn_width=None)
    src = LakeDatasource(lake, conv_ids=[conv])
    assert len(src._parts) == 1  # pruned to the key's single range

    got = read_lake(lake, conv_ids=[conv]).to_pandas()
    want = live.filter(pc.equal(live["conv_id"], conv)).to_pandas()
    assert got.sort_values(["turn_idx"]).reset_index(drop=True).equals(
        want.sort_values(["turn_idx"]).reset_index(drop=True)
    )
