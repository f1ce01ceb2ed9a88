"""
Lightweight pipeline observability (an upgrade over the reference, which
has only a final samples/sec line — SURVEY.md §5).

Set BONITO_TPU_PROFILE=1 to wrap each basecall pipeline stage in a timer
that records items seen and the time spent blocked waiting on the
upstream stage; a per-stage report prints at stream end. The stage whose
downstream waits the longest is the bottleneck.
"""

import atexit
import os
import sys
import time

_REPORTS = []


def enabled():
    return bool(os.environ.get("BONITO_TPU_PROFILE"))


class StageStats:
    def __init__(self, name):
        self.name = name
        self.items = 0
        self.wait_s = 0.0
        self.first = None
        self.last = None

    def row(self):
        span = (self.last - self.first) if self.items else 0.0
        rate = self.items / span if span > 0 else 0.0
        return (f"  {self.name:<12} items={self.items:<8} "
                f"upstream-wait={self.wait_s:8.2f}s  "
                f"rate={rate:8.1f}/s")


def instrument(name, iterable):
    """Wrap a pipeline stage; no-op unless profiling is enabled."""
    if not enabled():
        return iterable
    stats = StageStats(name)
    _REPORTS.append(stats)

    def gen():
        it = iter(iterable)
        while True:
            t0 = time.perf_counter()
            try:
                item = next(it)
            except StopIteration:
                return
            now = time.perf_counter()
            stats.wait_s += now - t0
            if stats.first is None:
                stats.first = now
            stats.last = now
            stats.items += 1
            yield item

    return gen()


def _report():
    if _REPORTS:
        sys.stderr.write("> pipeline stage profile:\n")
        for s in _REPORTS:
            sys.stderr.write(s.row() + "\n")


atexit.register(_report)
