"""Sampled spot-verification (oracle.sampled_verify / `verify
--sample-convs N`): the oracle folds only the sample's change rows and
the lake side point-reads only the sample's ranges — O(sample), never
O(lake). Must agree with the full verify on a correct lake, catch
corruption inside the sample, stay deterministic across calls, and keep
folding DDL so the sampled schema matches an evolved lake."""

import glob
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sampled_verify
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sources.changelog import list_segments


def _setup(tmp_path, n=2500, with_ddl=False):
    changes = gen_changes(n, 60, seed=11, dup_frac=0.02, out_of_order_frac=0.1,
                          with_ddl=with_ddl)
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=900)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    table = pads.dataset(list_segments(chg)).to_table()
    return table, lake


def test_sampled_verify_matches_and_is_deterministic(tmp_path, ray_session):
    table, lake = _setup(tmp_path)
    r1 = sampled_verify(table, lake, 15)
    assert r1["match"] and r1["sampled_convs"] == 15
    assert 0 < r1["rows"] == r1["oracle_rows"]
    r2 = sampled_verify(table, lake, 15)
    assert (r2["rows"], r2["oracle_rows"]) == (r1["rows"], r1["oracle_rows"])
    # n larger than the conv universe degrades to a full audit
    r_all = sampled_verify(table, lake, 10_000)
    assert r_all["match"] and r_all["sampled_convs"] <= 60


def test_sampled_verify_catches_in_sample_corruption(tmp_path, ray_session):
    table, lake = _setup(tmp_path)
    # corrupt one parquet payload of a conv IN the sample: flip a text.
    # find the sampled convs the same way sampled_verify does
    import hashlib

    import pyarrow.compute as pc

    convs = sorted(
        set(pc.drop_null(table["conv_id"]).unique().to_pylist()),
        key=lambda c: hashlib.sha1(c.encode()).hexdigest(),
    )[:10]
    victim = convs[0]
    hit = False
    # corrupt EVERY file holding the victim conv — some may carry only
    # LWW-superseded rows, so stopping at the first would leave the merged
    # view intact depending on glob order
    for p in glob.glob(os.path.join(lake, "**", "*.parquet"), recursive=True):
        t = pq.read_table(p)
        if "conv_id" not in t.column_names or "text" not in t.column_names:
            continue
        mask = pc.equal(t["conv_id"], victim).to_pylist()
        if not any(m for m in mask if m):
            continue
        texts = t["text"].to_pylist()
        for i, m in enumerate(mask):
            if m and texts[i]:
                texts[i] = "CORRUPTED"
                hit = True
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, t.schema.field("text").type))
        pq.write_table(t, p)
    assert hit, "no lake file held the victim conv"
    assert not sampled_verify(table, lake, 10)["match"]


def test_sampled_verify_folds_ddl(tmp_path, ray_session):
    table, lake = _setup(tmp_path, with_ddl=True)
    r = sampled_verify(table, lake, 12)
    assert r["match"], "sampled oracle must evolve schema like the lake did"
