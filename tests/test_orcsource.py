"""ORC connector (sources/orcsource.py): stripe-split read planning,
column pruning, atomic-commit write, and job-runner round trip."""

import os

import pyarrow as pa
import pytest
from pyarrow import orc

from datax_ray.sources.orcsource import read_orc, write_orc


def _events(n: int, start: int = 0) -> pa.Table:
    ids = list(range(start, start + n))
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i for i in ids], pa.timestamp("us")
            ),
            "kind": pa.array([f"k{i % 3}" for i in ids]),
            "value": pa.array([i * 0.5 for i in ids], pa.float64()),
        }
    )


@pytest.fixture()
def orc_dir(tmp_path):
    """Two ORC files, the first with multiple stripes (small stripe_size
    forces the split so the stripe-range planner has real work)."""
    d = tmp_path / "orc"
    d.mkdir()
    orc.write_table(
        _events(40_000), str(d / "a.orc"), stripe_size=64 * 1024
    )
    orc.write_table(_events(500, start=40_000), str(d / "b.orc"))
    return str(d)


def test_read_orc_stripe_split_and_content(ray_session, orc_dir):
    n_a = orc.ORCFile(os.path.join(orc_dir, "a.orc")).nstripes
    assert n_a > 1  # the fixture actually exercises stripe ranges

    ds = read_orc(orc_dir, stripes_per_task=1)
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    want = (
        pa.concat_tables([_events(40_000), _events(500, start=40_000)])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # ORC timestamps read back as ns — compare values at us resolution
    got["ts"] = got["ts"].astype("datetime64[us]")
    want["ts"] = want["ts"].astype("datetime64[us]")
    assert got.equals(want)


def test_read_orc_column_pruning(ray_session, orc_dir):
    ds = read_orc(orc_dir, columns=["event_id", "kind"])
    t = pa.Table.from_pylist(ds.take_all())
    assert set(t.column_names) == {"event_id", "kind"}
    assert t.num_rows == 40_500


def test_write_orc_atomic_and_roundtrip(ray_session, tmp_path):
    import ray

    src = _events(5_000)
    out = str(tmp_path / "out")
    rows = write_orc(ray.data.from_arrow(src), out)
    assert rows == 5_000
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))

    back = read_orc(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    back["ts"] = back["ts"].astype("datetime64[us]")
    assert back.equals(src.to_pandas())


def test_job_runner_orc_sync(ray_session, tmp_path):
    """parquet → orcwriter → orcreader → streamwriter, all through the
    DataX-shaped job config."""
    import pyarrow.parquet as pq

    from datax_ray.pipelines.job import run_job

    src = str(tmp_path / "src.parquet")
    pq.write_table(_events(2_000), src)
    orc_out = str(tmp_path / "orc_out")

    r1 = run_job(
        {
            "job": {
                "content": [
                    {
                        "reader": {"name": "parquetreader", "parameter": {"path": src}},
                        "writer": {
                            "name": "orcwriter",
                            "parameter": {"path": orc_out, "writeMode": "truncate"},
                        },
                    }
                ]
            }
        }
    )
    assert r1["records"] == 2_000

    r2 = run_job(
        {
            "job": {
                "content": [
                    {
                        "reader": {
                            "name": "orcreader",
                            "parameter": {"path": orc_out, "column": ["event_id"]},
                        },
                        "writer": {"name": "streamwriter", "parameter": {}},
                    }
                ]
            }
        }
    )
    assert r2["records"] == 2_000
