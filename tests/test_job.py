"""DataX-style JSON job runner tests (pipelines/job.py): reader →
transformer → writer configs over the driver testdata, dirty-record
errorLimit, writeModes, streamreader determinism, sqlite round trip."""

import glob
import json
import os
import sqlite3

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from datax_ray.pipelines.job import DirtyLimitExceeded, run_job

SF = "/root/testdata/sf0.001"


def _cfg(reader, writer, transformers=None, setting=None):
    content = {"reader": reader, "writer": writer}
    if transformers:
        content["transformer"] = transformers
    job = {"content": [content]}
    if setting:
        job["setting"] = setting
    return {"job": job}


def test_parquet_to_parquet_with_transformers(tmp_path):
    out = str(tmp_path / "out")
    cfg = _cfg(
        {
            "name": "parquetreader",
            "parameter": {
                "path": f"{SF}/documents.parquet",
                "column": ["doc_id", "text", "lang"],
            },
        },
        {"name": "parquetwriter", "parameter": {"path": out}},
        transformers=[
            {"name": "dx_filter", "parameter": {"column": "lang", "op": "=", "value": "en"}},
            {
                "name": "dx_substr",
                "parameter": {"column": "text", "startIndex": 0, "length": 10},
            },
        ],
    )
    summary = run_job(cfg)
    got = pq.ParquetDataset(glob.glob(f"{out}/*part-*.parquet")).read().to_pandas()
    want = duckdb.sql(
        f"""SELECT doc_id, substr(text, 1, 10) AS text, lang
            FROM read_parquet('{SF}/documents.parquet') WHERE lang = 'en'"""
    ).df()
    assert summary["records"] == len(want) == len(got)
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_job_config_from_file_and_csv_writer(tmp_path):
    out = str(tmp_path / "csvout")
    cfg = _cfg(
        {"name": "parquetreader", "parameter": {"path": f"{SF}/region.parquet"}},
        {"name": "csvwriter", "parameter": {"path": out}},
    )
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(cfg))
    summary = run_job(str(cfg_path))
    rows = sum(
        len(pd.read_csv(p)) for p in glob.glob(f"{out}/*part-*.csv")
    )
    assert rows == summary["records"] == 5  # TPC-H regions


def test_write_modes(tmp_path):
    out = str(tmp_path / "modes")
    base = _cfg(
        {"name": "parquetreader", "parameter": {"path": f"{SF}/region.parquet"}},
        {"name": "parquetwriter", "parameter": {"path": out, "writeMode": "truncate"}},
    )
    run_job(base)
    n1 = len(glob.glob(f"{out}/*part-*.parquet"))
    run_job(base)  # truncate: identical file count after re-run
    assert len(glob.glob(f"{out}/*part-*.parquet")) == n1
    base["job"]["content"][0]["writer"]["parameter"]["writeMode"] = "nonConflict"
    with pytest.raises(FileExistsError):
        run_job(base)


def test_streamreader_deterministic_and_speed_cap(tmp_path):
    out = str(tmp_path / "stream")
    cfg = _cfg(
        {
            "name": "streamreader",
            "parameter": {
                "count": 5000,
                "seed": 3,
                "column": [
                    {"name": "k", "type": "long", "random": [0, 100]},
                    {"name": "v", "type": "double", "value": 1.5},
                    {"name": "tag", "type": "string", "value": "fixed"},
                ],
            },
        },
        {"name": "parquetwriter", "parameter": {"path": out}},
        setting={"speed": {"record": 1_000_000}},
    )
    s1 = run_job(cfg)
    t1 = pq.ParquetDataset(glob.glob(f"{out}/*part-*.parquet")).read().to_pandas()
    s2 = run_job(cfg)
    t2 = pq.ParquetDataset(glob.glob(f"{out}/*part-*.parquet")).read().to_pandas()
    assert s1["records"] == s2["records"] == 5000
    k1 = t1.sort_values(["k", "v"]).reset_index(drop=True)
    k2 = t2.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(k1, k2)
    assert t1["tag"].eq("fixed").all()
    assert t1["k"].between(0, 99).all()


def test_speed_byte_cap_throttles(tmp_path):
    """job.setting.speed.byte (DataX's bytes/s cap): the same job with a
    byte cap far below its payload size must take measurably longer, and
    still write every record."""
    import time as _time

    def cfg_for(out, setting):
        return _cfg(
            {
                "name": "streamreader",
                "parameter": {
                    "count": 4000,
                    "seed": 9,
                    "column": [
                        {"name": "k", "type": "long", "random": [0, 100]},
                        {"name": "payload", "type": "string",
                         "value": "x" * 64},
                    ],
                },
            },
            {"name": "parquetwriter", "parameter": {"path": out}},
            setting=setting,
        )

    t0 = _time.perf_counter()
    s_fast = run_job(cfg_for(str(tmp_path / "fast"), {}))
    fast = _time.perf_counter() - t0

    # ~4000 * ~72B ≈ 290 KB of Arrow payload; cap at 150 KB/s (burst = one
    # second of rate) => at least ~0.9 s of enforced sleep.
    t0 = _time.perf_counter()
    s_slow = run_job(
        cfg_for(str(tmp_path / "slow"), {"speed": {"byte": 150_000}})
    )
    slow = _time.perf_counter() - t0

    assert s_fast["records"] == s_slow["records"] == 4000
    assert slow > fast + 0.5, (fast, slow)


def test_dirty_cast_routing_and_error_limit(tmp_path):
    src = tmp_path / "src.csv"
    n_bad = 7
    rows = ["id,num"] + [f"{i},{i * 2}" for i in range(93)] + [
        f"{90 + i},not-a-number" for i in range(n_bad)
    ]
    src.write_text("\n".join(rows) + "\n")
    out = str(tmp_path / "out")

    cfg = _cfg(
        {
            "name": "csvreader",
            "parameter": {"path": str(src), "casts": {"num": "long"}},
        },
        {"name": "parquetwriter", "parameter": {"path": out}},
        setting={"errorLimit": {"record": 100}},
    )
    summary = run_job(cfg, job_dir=str(tmp_path / "job"))
    assert summary["records"] == 93
    assert summary["dirty_records"] == n_bad
    dl = glob.glob(f"{tmp_path}/job/deadletter/dl-*.csv")
    assert dl
    spilled = pd.concat([pd.read_csv(p) for p in dl])
    assert set(spilled["reason"]) == {"cast_failed:num:long"}

    cfg["job"]["setting"] = {"errorLimit": {"record": 2}}
    with pytest.raises(DirtyLimitExceeded):
        run_job(cfg, job_dir=str(tmp_path / "job2"))

    cfg["job"]["setting"] = {"errorLimit": {"percentage": 0.01}}
    with pytest.raises(DirtyLimitExceeded):
        run_job(cfg, job_dir=str(tmp_path / "job3"))


def test_sqlite_roundtrip_with_pre_post_sql(tmp_path):
    db = str(tmp_path / "x.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE src (id INTEGER PRIMARY KEY, name TEXT)")
    con.executemany(
        "INSERT INTO src VALUES (?, ?)", [(i, f"n{i}") for i in range(200)]
    )
    con.commit()
    con.close()

    cfg = _cfg(
        {
            "name": "sqlitereader",
            "parameter": {
                "db": db,
                "table": "src",
                "column": ["id", "name"],
                "splitPk": "id",
                "numSplits": 4,
                "where": "id < 150",
            },
        },
        {
            "name": "sqlitewriter",
            "parameter": {
                "db": db,
                "table": "dst",
                "column": ["id", "name"],
                "writeMode": "replace",
                "preSql": [
                    "CREATE TABLE IF NOT EXISTS dst (id INTEGER PRIMARY KEY, name TEXT)",
                    "DELETE FROM dst",
                ],
                "postSql": ["CREATE INDEX IF NOT EXISTS dst_name ON dst(name)"],
            },
        },
    )
    summary = run_job(cfg, job_dir=str(tmp_path / "job"))
    assert summary["records"] == 150
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM dst").fetchone()[0] == 150
    assert con.execute(
        "SELECT name FROM sqlite_master WHERE name='dst_name'"
    ).fetchone()
    con.close()


def test_streamwriter_counts(tmp_path):
    cfg = _cfg(
        {"name": "parquetreader", "parameter": {"path": f"{SF}/nation.parquet"}},
        {"name": "streamwriter"},
    )
    assert run_job(cfg, job_dir=str(tmp_path))["records"] == 25


def test_duplicate_identical_blocks_are_not_collapsed(tmp_path):
    """Two tasks producing byte-identical blocks (constant columns) must
    both land on disk: part names carry (task_idx, block ordinal), so a
    pure content-hash collapse cannot silently drop rows."""
    out = str(tmp_path / "dup")
    cfg = _cfg(
        {
            "name": "streamreader",
            "parameter": {
                "count": 40000,
                "seed": 1,
                "column": [
                    {"name": "v", "type": "string", "value": "constant"},
                ],
            },
        },
        {"name": "parquetwriter", "parameter": {"path": out}},
    )
    s = run_job(cfg)
    assert s["records"] == 40000
    total = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(f"{out}/*part-*.parquet")
    )
    assert total == 40000  # every row on disk, none deduped away


def test_fractional_long_cast_routes_to_deadletter_with_original(tmp_path):
    """'3.7' under a long cast is a DIRTY record (not a job abort), and
    the dead-letter row preserves the original offending value."""
    import pandas as pd

    src = tmp_path / "src.csv"
    src.write_text("id,num\n1,10\n2,3.7\n3,xyz\n4,20\n")
    out = str(tmp_path / "out")
    cfg = _cfg(
        {"name": "csvreader",
         "parameter": {"path": str(src), "casts": {"num": "long"}}},
        {"name": "parquetwriter", "parameter": {"path": out}},
        setting={"errorLimit": {"record": 10}},
    )
    s = run_job(cfg)
    assert s["records"] == 2 and s["dirty_records"] == 2
    dl = pd.concat([
        pd.read_csv(p) for p in glob.glob(s["deadletter_dir"] + "/*.csv")
    ])
    vals = set(dl["num"].astype(str))
    assert vals == {"3.7", "xyz"}  # originals preserved, not nulled


def test_multi_content_entries_run_and_total(ray_session, tmp_path):
    """DataX job.content is a LIST: every entry is an independent pipe;
    the summary totals all of them and errorLimit is job-scoped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_ray.pipelines.job import run_job

    src1 = str(tmp_path / "a.parquet")
    src2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"k": list(range(100))}), src1)
    pq.write_table(pa.table({"k": list(range(250))}), src2)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")

    summary = run_job(
        {
            "job": {
                "content": [
                    {
                        "reader": {"name": "parquetreader", "parameter": {"path": src1}},
                        "writer": {"name": "parquetwriter", "parameter": {"path": out1}},
                    },
                    {
                        "reader": {"name": "parquetreader", "parameter": {"path": src2}},
                        "writer": {"name": "streamwriter", "parameter": {}},
                    },
                ]
            }
        }
    )
    assert summary["records"] == 350
    assert [c["records"] for c in summary["contents"]] == [100, 250]
    assert pq.ParquetDataset(
        [os.path.join(out1, f) for f in os.listdir(out1) if f.endswith(".parquet")]
    ).read().num_rows == 100


def test_lake_endpoints_in_job_matrix(tmp_path):
    """The CDC lake as a first-class DataX endpoint: a parquet→lakewriter
    job full-loads a transcripts snapshot (bootstrap path), a
    lakereader→csv job exports the committed live rows, and the round
    trip preserves every row. writeMode contracts: nonConflict refuses a
    non-empty lake, append points users at the CDC path."""
    import pyarrow as pa

    from datax_ray.fixtures.generator import gen_transcripts
    from datax_ray.sinks.lake import final_table

    snap = gen_transcripts(n_convs=80, seed=5)
    src = str(tmp_path / "snap.parquet")
    pq.write_table(snap, src)
    lake = str(tmp_path / "lake")

    out = run_job(_cfg(
        {"name": "parquetreader", "parameter": {"path": src}},
        {"name": "lakewriter",
         "parameter": {"lake": lake, "numPartitions": 8}},
    ))
    assert out["records"] == snap.num_rows
    got = final_table(lake)
    assert got.num_rows == snap.num_rows
    want = snap.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    for c in ("conv_id", "turn_idx", "role", "text"):
        assert got[c].to_pylist() == want[c].to_pylist()

    # lake -> csv export through the job matrix
    csv_out = str(tmp_path / "csv_out")
    out2 = run_job(_cfg(
        {"name": "lakereader",
         "parameter": {"lake": lake, "column": ["conv_id", "turn_idx", "text"]}},
        {"name": "csvwriter", "parameter": {"path": csv_out}},
    ))
    assert out2["records"] == snap.num_rows

    # contracts
    with pytest.raises(FileExistsError):
        run_job(_cfg(
            {"name": "parquetreader", "parameter": {"path": src}},
            {"name": "lakewriter",
             "parameter": {"lake": lake, "writeMode": "nonConflict"}},
        ))
    with pytest.raises(ValueError, match="change stream"):
        run_job(_cfg(
            {"name": "parquetreader", "parameter": {"path": src}},
            {"name": "lakewriter",
             "parameter": {"lake": lake, "writeMode": "append"}},
        ))
    # truncate replaces the lake wholesale
    out3 = run_job(_cfg(
        {"name": "parquetreader", "parameter": {"path": src}},
        {"name": "lakewriter",
         "parameter": {"lake": lake, "writeMode": "truncate",
                       "numPartitions": 4}},
    ))
    assert out3["records"] == snap.num_rows
    assert final_table(lake).num_rows == snap.num_rows


def test_envelope_reader_in_job_matrix(tmp_path):
    """An envelope export (sinks/feedout.py) is a first-class job SOURCE:
    an envelopereader→jsonl job re-ships every change record, count
    preserved."""
    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.feedout import export_change_feed_envelopes

    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_segments(gen_changes(1500, 30, seed=55), chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4,
                        segments_per_epoch=2))
    env = str(tmp_path / "env")
    r = export_change_feed_envelopes(lake, env, fmt="jsonl")

    out = run_job(_cfg(
        {"name": "envelopereader", "parameter": {"path": env}},
        {"name": "jsonlwriter", "parameter": {"path": str(tmp_path / "out")}},
    ))
    assert out["records"] == r["rows"]
