"""Lake fsck: clean lakes pass; missing/tampered/orphan files are found."""

import glob
import os

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.fsck import fsck
from datax_ray.pipelines.replay import ReplayConfig, replay


def _build(tmp_path):
    changes = gen_changes(3000, 40, seed=44)
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    return lake


def test_fsck_clean_lake_passes(tmp_path):
    lake = _build(tmp_path)
    rep = fsck(lake, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["checked_files"] > 0
    assert rep["epochs"] >= 2


def test_fsck_detects_missing_and_orphans(tmp_path):
    lake = _build(tmp_path)

    # Orphan: a stray data file no manifest references (crashed writer).
    stray_dir = os.path.join(lake, "r=0000")
    os.makedirs(stray_dir, exist_ok=True)
    stray = os.path.join(stray_dir, "e=000099-deadbeefdeadbeef.parquet")
    some = glob.glob(os.path.join(lake, "p=*", "*.parquet"))[0]
    import shutil
    shutil.copy(some, stray)

    rep = fsck(lake)
    assert any("e=000099" in f for f in rep["orphan_files"])
    assert rep["ok"]  # orphans are vacuum candidates, not errors

    # Missing referenced file: delete a committed base.
    os.remove(some)
    rep2 = fsck(lake)
    assert not rep2["ok"]
    assert any("missing referenced file" in e for e in rep2["errors"])


def test_fsck_deep_detects_tamper(tmp_path):
    lake = _build(tmp_path)
    frag = glob.glob(os.path.join(lake, "r=*", "e=*.parquet"))[0]
    data = open(frag, "rb").read()
    with open(frag, "wb") as f:  # flip bytes, keep the name
        f.write(data[:-4] + b"XXXX")
    rep = fsck(lake, deep=True)
    assert not rep["ok"]
    assert any("content-hash mismatch" in e for e in rep["errors"])
