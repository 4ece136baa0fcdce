"""AtomicDirDatasink tests: manifest-gated reads, retry idempotence,
failure leaves no manifest, re-run heals orphans."""

import json
import os

import pyarrow as pa
import pytest
import ray.data

from datax_ray.sinks.datasink import AtomicDirDatasink, read_committed


def _ds(n=1000):
    return ray.data.from_arrow(
        pa.table({"k": list(range(n)), "v": [f"s{i}" for i in range(n)]})
    ).repartition(4)


def test_write_commit_and_readback(tmp_path):
    out = str(tmp_path / "out")
    _ds().write_datasink(AtomicDirDatasink(out, "parquet"))
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m["rows"] == 1000
    disk = {f for f in os.listdir(out) if f.startswith(("part-", "g0"))}
    assert disk == {r["file"] for r in m["files"]}
    back = read_committed(out)
    assert back.count() == 1000
    assert sorted(r["k"] for r in back.take_all()) == list(range(1000))


def test_rerun_is_idempotent(tmp_path):
    out = str(tmp_path / "out")
    sink = AtomicDirDatasink(out, "jsonl")
    _ds().write_datasink(sink)
    files1 = sorted(f for f in os.listdir(out) if f.startswith(("part-", "g0")))
    _ds().write_datasink(sink)  # identical content → identical names
    files2 = sorted(f for f in os.listdir(out) if f.startswith(("part-", "g0")))
    assert files1 == files2
    assert read_committed(out).count() == 1000


def test_failed_write_leaves_no_manifest_and_orphans_invisible(tmp_path):
    out = str(tmp_path / "out")
    _ds().write_datasink(AtomicDirDatasink(out, "parquet"))

    def boom(t: pa.Table) -> pa.Table:
        raise RuntimeError("injected failure")

    with pytest.raises(Exception):
        _ds(200).map_batches(boom, batch_format="pyarrow").write_datasink(
            AtomicDirDatasink(out, "parquet")
        )
    # on_write_start removed the old manifest; the failed job never
    # published a new one → reader refuses stale/partial state.
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    with pytest.raises(FileNotFoundError):
        read_committed(out)
    # Re-running the good job heals: manifest lists only its own files.
    _ds(500).write_datasink(AtomicDirDatasink(out, "parquet"))
    assert read_committed(out).count() == 500


def test_append_mode_accumulates_and_crash_keeps_old_commit(tmp_path):
    """append=True merges prior manifest files into the new commit (DataX
    hdfswriter append semantics), even for byte-identical re-appends
    (generation-stamped part names); a crashed append leaves the OLD
    manifest readable."""
    out = str(tmp_path / "out")
    _ds(300).write_datasink(AtomicDirDatasink(out, "parquet"))
    assert read_committed(out).count() == 300

    # identical content appended again must DOUBLE, not collapse
    _ds(300).write_datasink(AtomicDirDatasink(out, "parquet", append=True))
    assert read_committed(out).count() == 600
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["generation"] == 1 and man["rows"] == 600

    def boom(t: pa.Table) -> pa.Table:
        raise RuntimeError("injected failure")

    with pytest.raises(Exception):
        _ds(50).map_batches(boom, batch_format="pyarrow").write_datasink(
            AtomicDirDatasink(out, "parquet", append=True)
        )
    # old commit still fully readable after the failed append
    assert read_committed(out).count() == 600
