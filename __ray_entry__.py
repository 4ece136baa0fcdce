"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship CDC pipeline over /root/testdata/sf0.001:
derive a transcript change log from the `events` table, replay it through
normalize → salted hash shuffle → LWW merge-apply → exactly-once manifest
commit, and return the materialized lake.

`queries()` exposes every implemented operator/pipeline from SURVEY.md §2
(and the training-data uplift ops); `oracle_sql()` gives the DuckDB
equivalent for each SQL-expressible one (same column names).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from datax_ray.pipelines.queries import cdc_replay_final

    return cdc_replay_final("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from datax_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datax_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
