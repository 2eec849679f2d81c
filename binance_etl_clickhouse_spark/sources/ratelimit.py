"""Token-bucket rate limiting for partition-local fetch loops.

The reference throttles globally with ``@limits(calls, period)`` decorators in
one process (crypto_data_pipeline_clickhouse.py:47-52, :190-214). On a
cluster there is no shared limiter, so the global budget is *divided* across
fetch partitions (SURVEY.md C2): each partition gets ``calls // n_partitions``
tokens per period. Slightly conservative (unused budget in one partition
isn't lent to another) but safe at any parallelism.
"""

from __future__ import annotations

import time


class TokenBucket:
    def __init__(self, calls: int, period_s: float, clock=time.monotonic, sleeper=time.sleep):
        self.capacity = max(1, calls)
        self.period_s = period_s
        self.tokens = float(self.capacity)
        self.rate = self.capacity / period_s  # tokens per second
        self.updated = clock()
        self._clock = clock
        self._sleep = sleeper

    def acquire(self, n: int = 1) -> None:
        """Block until ``n`` tokens are available, then consume them.

        The epsilon in the availability check matters: replenishment is
        ``elapsed * rate`` and the sleep is ``deficit / rate`` — the
        round-trip through floating point can come back a hair short of the
        deficit, and without the epsilon the loop degenerates into
        ever-smaller sleeps that never reach ``n`` (a Zeno loop; found by
        the hypothesis property test with a simulated clock).
        """
        if n > self.capacity:
            # A weight larger than the bucket could otherwise never be
            # satisfied (tokens cap at capacity -> infinite sleep loop, e.g.
            # weight_per_call=2 against a budget_calls//n_partitions == 1
            # bucket). Widen the burst size to the weight; the refill RATE is
            # untouched, so long-run throughput still honors the budget.
            self.capacity = float(n)
        while True:
            now = self._clock()
            self.tokens = min(self.capacity, self.tokens + (now - self.updated) * self.rate)
            self.updated = now
            if self.tokens + 1e-9 >= n:
                self.tokens = max(0.0, self.tokens - n)
                return
            self._sleep((n - self.tokens) / self.rate)


def per_partition_budget(total_calls: int, period_s: float, n_partitions: int) -> TokenBucket:
    return TokenBucket(max(1, total_calls // max(1, n_partitions)), period_s)
