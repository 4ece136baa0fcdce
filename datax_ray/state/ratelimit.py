"""Global throughput cap — DataX `job.setting.speed` (SURVEY.md §2A row 19).

One named zero-CPU actor owns a token bucket; every normalize task asks it
`acquire(n_rows)` once per BATCH and sleeps the returned backoff. That gives
a GLOBAL records/s cap across all tasks (DataX's semantic: the job-level
speed limit spread over channels) with one tiny RPC per ~64k rows — the
actor is never a throughput bottleneck, it only ever says "wait".
"""

from __future__ import annotations

import time

import ray

RATE_ACTOR_NAME = "datax_rate_limiter"


@ray.remote(num_cpus=0)
class RateLimiterActor:
    def __init__(self, rate_per_s: float = float("inf")):
        self.rate = float(rate_per_s)
        self.avail = 0.0
        self.last = time.monotonic()

    def set_rate(self, rate_per_s: float) -> None:
        self.rate = float(rate_per_s)
        self.avail = 0.0
        self.last = time.monotonic()

    def acquire(self, n: int) -> float:
        """Take n tokens; returns seconds the caller must sleep (0 if the
        bucket covers it). Burst capacity = one second of rate."""
        if self.rate == float("inf") or self.rate <= 0:
            return 0.0
        now = time.monotonic()
        self.avail = min(self.avail + (now - self.last) * self.rate, self.rate)
        self.last = now
        self.avail -= n
        if self.avail >= 0:
            return 0.0
        return -self.avail / self.rate


_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}


def get_rate_limiter(rate_per_s: float, name: str = RATE_ACTOR_NAME):
    """Get-or-create a named limiter and (re)set its rate (pinned by a
    process-level handle; see state/metrics.py for why not detached).
    The token unit is whatever the caller acquires — rows for the
    records/s cap, bytes for the bytes/s cap (DataX speed.record vs
    speed.byte) — so the same actor class serves both under distinct
    names."""
    if name not in _HANDLES:
        _HANDLES[name] = RateLimiterActor.options(
            name=name, get_if_exists=True
        ).remote()
    actor = _HANDLES[name]
    ray.get(actor.set_rate.remote(rate_per_s))
    return actor
