"""CSV/JSONL source: type-matrix coercion, dirty routing, header skip,
and round-trip equality against the parquet original."""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datax_ray.sources.textsource import TYPE_MATRIX, csv_source, jsonl_source

SPEC = [
    {"name": "id", "type": "long"},
    {"name": "score", "type": "double"},
    {"name": "name", "type": "string"},
    {"name": "ts", "type": "date"},
    {"name": "ok", "type": "bool"},
]


def _write(path: str, lines: list[str]) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def test_csv_type_matrix_and_nulls(ray_session, tmp_path):
    p = _write(
        str(tmp_path / "a.csv"),
        [
            "1,2.5,alpha,2026-01-02 03:04:05.000006,true",
            "2,,beta,,false",  # empty fields = typed nulls
            ",0.25,,2026-02-03 00:00:00.000000,1",
        ],
    )
    t = csv_source(p, SPEC).to_pandas().sort_values("score").reset_index(drop=True)
    assert list(t.columns) == [c["name"] for c in SPEC]
    assert t["id"].tolist()[0] is None or pd.isna(t["id"].tolist()[0])
    assert t.loc[1, "id"] == 1 and t.loc[1, "score"] == 2.5
    assert t.loc[1, "ts"] == pd.Timestamp("2026-01-02 03:04:05.000006")
    assert bool(t.loc[0, "ok"]) is True and bool(t.loc[2, "ok"]) is False
    assert pd.isna(t.loc[2, "score"]) and pd.isna(t.loc[2, "ts"])


def test_csv_dirty_rows_routed(ray_session, tmp_path):
    dl = str(tmp_path / "dl")
    p = _write(
        str(tmp_path / "b.csv"),
        [
            "1,1.0,x,2026-01-01 00:00:00.000000,true",
            "notanint,1.0,x,2026-01-01 00:00:00.000000,true",  # cast:id
            "2,1.5,y,garbage-date,false",                      # cast:ts
            "3,2.0,z,2026-01-01 00:00:00.000000,maybe",        # cast:ok
            "4,2.0,w,2026-01-01 00:00:00.000000",              # structural
            "5,3.5,v,2026-01-01 00:00:00.000000,false",
        ],
    )
    t = csv_source(p, SPEC, deadletter_dir=dl).to_pandas()
    assert sorted(t["id"].tolist()) == [1, 5]
    dirty = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{dl}/*.parquet")]
    )
    assert len(dirty) == 4
    reasons = set(dirty["reason"])
    assert {"cast:id:long", "cast:ts:date", "cast:ok:bool", "structural"} == reasons


def test_csv_header_skip_and_idempotent_dlq(ray_session, tmp_path):
    dl = str(tmp_path / "dl2")
    header = "id,score,name,ts,ok"
    p = _write(
        str(tmp_path / "c.csv"),
        [header, "1,1.0,x,2026-01-01 00:00:00.000000,true", "bad,,x,,true"],
    )
    t1 = csv_source(p, SPEC, deadletter_dir=dl, skip_header=header).to_pandas()
    n_files = len(glob.glob(f"{dl}/*.parquet"))
    t2 = csv_source(p, SPEC, deadletter_dir=dl, skip_header=header).to_pandas()
    assert len(t1) == len(t2) == 1
    # content-hash filenames: the rerun rewrote the SAME file, not a new one
    assert len(glob.glob(f"{dl}/*.parquet")) == n_files == 1


def test_jsonl_roundtrip_and_dirty(ray_session, tmp_path):
    dl = str(tmp_path / "dl3")
    rows = [
        {"id": 1, "score": 0.5, "name": "a",
         "ts": "2026-01-01 00:00:00.000000", "ok": "true"},
        {"id": 2, "score": 1.5, "name": None,
         "ts": "2026-03-04 05:06:07.000008", "ok": "false"},
    ]
    lines = [json.dumps(r) for r in rows] + ["{not json", '{"id": "xyz"}']
    p = _write(str(tmp_path / "d.jsonl"), lines)
    t = jsonl_source(p, SPEC, deadletter_dir=dl).to_pandas()
    assert sorted(t["id"].tolist()) == [1, 2]
    assert t.sort_values("id")["ts"].tolist()[1] == pd.Timestamp(
        "2026-03-04 05:06:07.000008"
    )
    dirty = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{dl}/*.parquet")]
    )
    assert set(dirty["reason"]) == {"structural", "cast:id:long"}


def test_csv_roundtrip_events_parquet(ray_session, tmp_path):
    """Full fidelity loop: parquet -> CSV text -> csv_source == original."""
    src = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    df = src.to_pandas()
    csv_path = str(tmp_path / "events.csv")
    df.to_csv(csv_path, index=False, sep="|",
              date_format="%Y-%m-%d %H:%M:%S.%f")
    spec = [
        {"name": "event_id", "type": "long"},
        {"name": "ts", "type": "date"},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
    ]
    got = (
        csv_source(csv_path, spec, delimiter="|",
                   skip_header="event_id|ts|user_id|event_type|value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values("event_id").reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(
        got.astype({"event_id": "int64", "user_id": "int64"}), want,
        check_dtype=False,
    )
    # doubles must be BIT-identical after the text round-trip
    assert (got["value"].to_numpy() == want["value"].to_numpy()).all()
