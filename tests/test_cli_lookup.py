"""`lookup` CLI driver-materialization bound (VERDICT r4 #6): the one
command an operator reflexively runs on a big lake must not take_all()
the whole result onto the driver. Default --limit 1000; the JSON reports
the TRUE distributed total next to the bounded `rows`; --limit 0 is the
explicit full-dump override.

Runs the CLI in a subprocess (the verb owns a Ray session and shuts it
down, which must not kill the test session's cluster).
"""

import json
import os
import subprocess
import sys

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _run(args):
    env = {**os.environ, "RAY_ADDRESS": "local"}
    out = subprocess.run(
        [sys.executable, "-m", "datax_ray", *args],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_lookup_limit_bounds_driver_rows(tmp_path, ray_session):
    changes = gen_changes(3000, 50, seed=71)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=1500)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4))

    full = final_table(lake)
    n_user = sum(1 for v in full["role"].to_pylist() if v == "user")
    assert n_user > 2

    base = ["lookup", "--lake", lake, "--where", "role=user",
            "--num-cpus", "4"]
    # bounded: 2 rows cross the driver, true total still reported
    got = _run([*base, "--limit", "2"])
    assert got["shown"] == len(got["rows"]) == 2
    assert got["total_rows"] == n_user

    # explicit full dump remains available behind the override flag
    got0 = _run([*base, "--limit", "0"])
    assert got0["shown"] == got0["total_rows"] == n_user
