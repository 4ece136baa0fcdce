"""datax_ray — a Ray-Data-native CDC / incremental-ingest engine.

Built from scratch against the capability surface of tbs005/DataX
(/root/reference, pre-code snapshot: README.md:1-3) as specified by
BASELINE.json's north rule: binlog/WAL-style change-log replay → Parquet
lake upsert with last-writer-wins semantics, schema evolution, exactly-once
two-phase-commit sink, per-partition lineage + channel-statistics metrics,
and dirty-record accounting — all expressed as ray.data.Dataset pipelines
over zero-copy Arrow batches (see SURVEY.md).
"""

from datax_ray import _raypatch

_raypatch.apply()

from datax_ray.schemas import (
    CHANGES_SCHEMA,
    LAKE_SCHEMA,
    TRANSCRIPTS_SCHEMA,
)
from datax_ray.pipelines.bootstrap import bootstrap
from datax_ray.pipelines.feed import plan_change_feed, read_change_feed
from datax_ray.pipelines.mirror import mirror_to_sql
from datax_ray.pipelines.mv import read_mv, refresh_mv
from datax_ray.pipelines.replay import ReplayConfig, compact_lake, replay, tail
from datax_ray.sinks.export import export_lake
from datax_ray.sinks.lake import final_table, read_lake

__all__ = [
    "CHANGES_SCHEMA",
    "LAKE_SCHEMA",
    "TRANSCRIPTS_SCHEMA",
    "ReplayConfig",
    "replay",
    "tail",
    "bootstrap",
    "compact_lake",
    "refresh_mv",
    "read_mv",
    "export_lake",
    "read_lake",
    "final_table",
    "read_change_feed",
    "plan_change_feed",
    "mirror_to_sql",
]
