"""
Lightweight pipeline observability (an upgrade over the reference, which
has only a final samples/sec line — SURVEY.md §5).

Set BONITO_TPU_PROFILE=1 to wrap each basecall pipeline stage in a timer
that records, per stage: items seen, time blocked waiting on the
upstream stage, time suspended at the yield (the consumer wasn't asking
— i.e. blocked on DOWNSTREAM backpressure or the consumer was busy),
and the throughput while not upstream-blocked. A stage with large
down-wait is throttled by a LATER stage (its rate understates its
capability by exactly that share); the bottleneck is the stage whose
up-wait and down-wait are both small. Caveat: spans include the initial
jit compile, so single short runs understate steady-state rates — use
marginal-size runs for honest numbers (DESIGN.md round-3 CLI notes).
"""

import atexit
import os
import sys
import time

_REPORTS = []


def enabled():
    # "0" must DISABLE (any non-empty string is truthy — round-5 review)
    return os.environ.get("BONITO_TPU_PROFILE", "") not in ("", "0")


class StageStats:
    def __init__(self, name):
        self.name = name
        self.items = 0
        self.wait_s = 0.0       # blocked in upstream next()
        self.down_s = 0.0       # suspended at our yield (consumer away)
        self.first = None
        self.last = None

    def row(self):
        span = (self.last - self.first) if self.items else 0.0
        active = max(span - self.wait_s, 0.0)
        rate = self.items / active if active > 0 else 0.0
        return (f"  {self.name:<12} items={self.items:<7} "
                f"up-wait={self.wait_s:7.2f}s  "
                f"down-wait={self.down_s:7.2f}s  "
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
            if stats.first is None:
                stats.first = t0
            try:
                item = next(it)
            except StopIteration:
                return
            now = time.perf_counter()
            stats.wait_s += now - t0
            stats.last = now
            stats.items += 1
            yield item
            stats.down_s += time.perf_counter() - now

    return gen()


_BATCHES = []


def batch_timing(dispatch_s, fetch_s, gap_s=0.0):
    """Record one device-stage cycle (BONITO_TPU_PROFILE=2 prints each).
    ``gap_s`` is the time between the previous cycle's end and this
    dispatch — waiting on the input-batch queue plus yield backpressure."""
    if not enabled():
        return
    _BATCHES.append((dispatch_s, fetch_s, gap_s))
    if os.environ.get("BONITO_TPU_PROFILE") == "2":
        sys.stderr.write(f"  [batch {len(_BATCHES):3d}] "
                         f"dispatch={dispatch_s*1e3:7.1f} ms  "
                         f"fetch={fetch_s*1e3:7.1f} ms  "
                         f"gap={gap_s*1e3:7.1f} ms\n")


def _report():
    if _BATCHES:
        import statistics
        tail = _BATCHES[max(2, len(_BATCHES) // 4):] or _BATCHES
        d = statistics.median(t[0] for t in tail)
        f = statistics.median(t[1] for t in tail)
        g = statistics.median(t[2] for t in tail)
        sys.stderr.write(
            f"> device stage: {len(_BATCHES)} batches, steady median "
            f"dispatch={d*1e3:.1f} ms fetch={f*1e3:.1f} ms "
            f"gap={g*1e3:.1f} ms\n")
    if _REPORTS:
        sys.stderr.write("> pipeline stage profile (rate = items per "
                         "non-upstream-blocked second):\n")
        for s in _REPORTS:
            sys.stderr.write(s.row() + "\n")


atexit.register(_report)
