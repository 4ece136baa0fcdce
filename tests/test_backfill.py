"""Backfill / bulk UPDATE (pipelines/backfill.py): transformed live state
equals transforming the final table directly; idempotent convergence;
where/conv_ids restriction; key/ts immutability enforced; future events
still defeat the rewrite; purge-after-backfill stays overflow-safe; the
change feed folds the rewrite into downstream views."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.backfill import backfill
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

SPEC = [{"name": "dx_replace", "column": "text", "pattern": "quick",
         "replacement": "QUICK"}]


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(4000, 50, seed=81, p_delete=0.12)
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


def test_backfill_equals_direct_and_idempotent(lake):
    chg, lk = lake
    before = _final(lk)
    r1 = backfill(lk, SPEC)
    assert r1["rewritten_rows"] > 0 and r1["epoch"] is not None

    after = _final(lk)
    want_text = pc.replace_substring(before["text"], "quick", "QUICK")
    assert after["text"].combine_chunks().equals(want_text.combine_chunks())
    # nothing else moved
    for c in ("conv_id", "turn_idx", "role", "tool", "ts"):
        assert after[c].equals(before[c])

    # idempotent chain converges: second run rewrites nothing, no epoch
    r2 = backfill(lk, SPEC)
    assert r2["rewritten_rows"] == 0 and r2["epoch"] is None

    # a genuinely newer source event still wins over the rewrite
    victim = after["conv_id"][0].as_py()
    vturn = after["turn_idx"][0].as_py()
    newer = pa.table(
        {
            "lsn": pa.array([999_999], pa.int64()),
            "ts": pa.array([pc.max(after["ts"]).as_py()], pa.timestamp("us")),
            "op": pa.array(["update"], pa.string()),
            "conv_id": pa.array([victim], pa.string()),
            "turn_idx": pa.array([vturn], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["the future wins"], pa.string()),
            "tool": pa.array([""], pa.string()),
            "ddl": pa.array([None], pa.string()),
        }
    )
    write_segments(newer, chg, seg_rows=1000, start_seg=4)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    live = _final(lk)
    m = pc.and_(pc.equal(live["conv_id"], victim),
                pc.equal(live["turn_idx"], vturn))
    assert live.filter(m)["text"][0].as_py() == "the future wins"


def test_where_and_conv_restriction(lake):
    _, lk = lake
    before = _final(lk)
    spec = [{"name": "dx_replace", "column": "text", "pattern": "t",
             "replacement": "T"}]
    r = backfill(lk, spec, where={"role": "tool"})
    after = _final(lk)
    tool_rows = pc.equal(pc.fill_null(before["role"], ""), "tool")
    # non-tool rows untouched
    assert after.filter(pc.invert(tool_rows))["text"].equals(
        before.filter(pc.invert(tool_rows))["text"]
    )
    if r["rewritten_rows"]:
        changed = pc.invert(pc.equal(after["text"], before["text"]))
        assert pc.all(
            pc.equal(after.filter(changed)["role"], "tool")
        ).as_py()

    # conv_ids restriction: other convs untouched
    convs = sorted(set(before["conv_id"].to_pylist()))[:2]
    b2 = _final(lk)
    backfill(lk, SPEC, conv_ids=convs)
    a2 = _final(lk)
    outside = pc.invert(pc.is_in(b2["conv_id"],
                                 value_set=pa.array(convs)))
    assert a2.filter(outside)["text"].equals(b2.filter(outside)["text"])


def test_immutability_and_purge_after_backfill(lake):
    _, lk = lake
    # lambdas pickle by value, so workers don't need this test module
    shift_ts = lambda t: t.set_column(  # noqa: E731
        t.column_names.index("ts"), "ts",
        pc.add(t["ts"], pa.scalar(1_000_000, pa.duration("us"))),
    )
    rekey = lambda t: t.set_column(  # noqa: E731
        t.column_names.index("conv_id"), "conv_id",
        pc.binary_join_element_wise(t["conv_id"], "x", ""),
    )
    with pytest.raises(Exception, match="ts"):
        backfill(lk, [{"name": "udf", "fn": shift_ts}])
    with pytest.raises(Exception, match="conv_id|keys"):
        backfill(lk, [{"name": "udf", "fn": rekey}])

    # purge a conv whose winner is a synthetic-lsn backfill rewrite
    backfill(lk, SPEC)
    from datax_ray.pipelines.purge import purge

    victim = _final(lk)["conv_id"][0].as_py()
    out = purge(lk, [victim])
    assert out["tombstoned_rows"] > 0
    assert victim not in set(_final(lk)["conv_id"].to_pylist())
    # idempotent purge (and no int64 overflow on re-purge)
    assert purge(lk, [victim])["tombstoned_rows"] == 0


def test_feed_folds_backfill_downstream(lake, tmp_path):
    """The rewrite is an ordinary change: the additive MV refreshed across
    the backfill equals a direct recompute of the post-backfill state."""
    _, lk = lake
    from datax_ray.pipelines.mvadd import read_mv_additive, refresh_mv_additive

    mv = str(tmp_path / "mv")
    refresh_mv_additive(lk, mv)
    spec = [{"name": "dx_replace", "column": "text", "pattern": "the",
             "replacement": "thee"}]
    backfill(lk, spec)
    refresh_mv_additive(lk, mv)

    live = final_table(lk)
    chars = pc.cast(pc.fill_null(pc.utf8_length(live["text"]), 0), pa.int64())
    want = (
        pa.table({"conv_id": live["conv_id"], "sum_chars": chars})
        .group_by("conv_id", use_threads=False)
        .aggregate([("sum_chars", "sum")])
        .sort_by("conv_id")
    )
    got = (
        read_mv_additive(mv)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(got["sum_chars"]) == want["sum_chars_sum"].to_pylist()
