"""Incremental inverted index: ground-truth equality, fingerprint
incrementality across epochs, and purge/tombstone visibility."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.index import refresh_index, search_index
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

TERMS = ["quick", "lazy"]


def _truth(lake, terms):
    df = final_table(lake).to_pandas()
    tok = df.assign(term=df["text"].str.split(" ")).explode("term")
    return (
        tok[tok["term"].isin(terms)][["term", "conv_id", "turn_idx"]]
        .drop_duplicates()
        .sort_values(["term", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _got(idx, terms, mode="any"):
    df = search_index(idx, terms, mode=mode).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_index_matches_full_scan_and_skips_unchanged(tmp_path):
    changes = gen_changes(4000, 60, seed=31)
    chg, lake, idx = (str(tmp_path / d) for d in ("chg", "lake", "idx"))
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))

    rep = refresh_index(lake, idx)
    assert rep["refreshed"] > 0

    got = _got(idx, TERMS)
    want = _truth(lake, TERMS)
    assert got.equals(want) and len(got) > 0

    # AND-mode equals the per-turn all-terms ground truth.
    g = want.groupby(["conv_id", "turn_idx"])["term"].nunique()
    want_all = (
        g[g >= len(TERMS)].reset_index()[["conv_id", "turn_idx"]]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert _got(idx, TERMS, mode="all").equals(want_all)

    # No lake change -> every range skips.
    rep2 = refresh_index(lake, idx)
    assert rep2["refreshed"] == 0 and rep2["skipped"] > 0


def test_index_incremental_after_new_epoch(tmp_path):
    """A new epoch touching a subset of keys refreshes ONLY the ranges
    whose committed file set changed — and the index still matches."""
    import os

    changes = gen_changes(4000, 60, seed=32)
    chg, lake, idx = (str(tmp_path / d) for d in ("chg", "lake", "idx"))
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        compact_every=1000))  # keep compaction out of the way
    refresh_index(lake, idx)

    # One small segment for ONE conversation.
    one = changes.filter(pc.equal(changes["conv_id"], "conv-000007"))
    one = one.set_column(
        0, "lsn", pc.add(one["lsn"], int(pc.max(changes["lsn"]).as_py()) + 1)
    )
    import datetime
    one = one.set_column(
        1, "ts",
        pc.add(one["ts"], pa.scalar(
            datetime.timedelta(seconds=7200), pa.duration("us")
        )),
    )
    pq.write_table(one, os.path.join(chg, "seg-000000555.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        compact_every=1000))

    rep = refresh_index(lake, idx)
    assert 0 < rep["refreshed"] < rep["refreshed"] + rep["skipped"]
    assert _got(idx, TERMS).equals(_truth(lake, TERMS))


def test_index_drops_purged_keys_on_refresh(tmp_path):
    from datax_ray.pipelines.purge import purge

    changes = gen_changes(3000, 40, seed=33)
    chg, lake, idx = (str(tmp_path / d) for d in ("chg", "lake", "idx"))
    write_segments(changes, chg, seg_rows=1500)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    refresh_index(lake, idx)

    conv = final_table(lake)["conv_id"][0].as_py()
    assert (_got(idx, TERMS)["conv_id"] == conv).any()

    purge(lake, [conv])
    rep = refresh_index(lake, idx)
    assert rep["refreshed"] > 0  # the purged key's range was re-indexed
    got = _got(idx, TERMS)
    assert not (got["conv_id"] == conv).any()
    assert got.equals(_truth(lake, TERMS))
