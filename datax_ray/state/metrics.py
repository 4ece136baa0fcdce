"""Channel-statistics mirror (SURVEY.md §2A row 16; BASELINE.json
"speed/error metrics mirroring DataX's channel statistics").

A single named, zero-CPU Ray actor accumulates per-stage counters
(records/bytes in/out, dirty counts with reasons). Stages fire one async
`add` per BATCH (not per row), so the actor is never a throughput
bottleneck: at 64k-row batches, 10^10 events is ~150k RPCs total spread
over the job. The driver snapshots at epoch end and folds the numbers into
the manifest (lineage) and the final report — DataX's task→taskgroup→job
rollup collapses to stage→job because Ray owns the process topology.
"""

from __future__ import annotations

from collections import defaultdict

import ray

METRICS_ACTOR_NAME = "datax_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._c: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))

    def add(self, stage: str, counters: dict) -> None:
        s = self._c[stage]
        for k, v in counters.items():
            s[k] += v

    def snapshot(self) -> dict:
        return {stage: dict(kv) for stage, kv in self._c.items()}

    def reset(self) -> None:
        self._c.clear()


_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}
_HANDLES_LOCK = __import__("threading").Lock()


def get_metrics_actor(name: str = METRICS_ACTOR_NAME):
    """Get-or-create the named metrics actor in the current Ray session.

    A named-but-unreferenced actor dies the moment every handle is
    garbage-collected, and a concurrent get_if_exists can race the dying
    actor and receive a dead handle — so the creating process pins one
    handle here for the life of the session. (Deliberately not a detached
    actor: those trigger a raylet stdout notice under anonymous
    namespaces, which would pollute callers' stdout contracts.)

    Creation is LOCKED: two driver threads (concurrent replays of one
    lake) racing `.options(get_if_exists=True).remote()` can each create
    an actor, with the registration loser's dying instantly — the loser
    thread then holds a dead handle. One creation per process removes the
    race."""
    with _HANDLES_LOCK:
        if name not in _HANDLES:
            _HANDLES[name] = MetricsActor.options(
                name=name, get_if_exists=True
            ).remote()
        return _HANDLES[name]


def total_dirty(snapshot: dict) -> int:
    return int(sum(kv.get("dirty_rows", 0) for kv in snapshot.values()))
