"""Pipeline primitives: ordering, bounded queues, cancellation."""

import time

import pytest

from bonito_tpu.pipeline import (
    process_map, thread_iter, thread_map, thread_starmap,
)


class TestThreadMap:
    def test_preserves_order(self):
        items = [(i, i) for i in range(50)]

        def slow_sq(v):
            time.sleep(0.001 * (v % 7))
            return v * v

        out = list(thread_map(slow_sq, iter(items), n_thread=4))
        assert out == [(i, i * i) for i in range(50)]

    def test_zero_threads_inline(self):
        out = list(thread_map(lambda v: v + 1, iter([(0, 1), (1, 2)]),
                              n_thread=0))
        assert out == [(0, 2), (1, 3)]

    def test_starmap(self):
        out = list(thread_starmap(lambda a, b: a + b,
                                  iter([(0, (1, 2)), (1, (3, 4))]),
                                  n_thread=2))
        assert out == [(0, 3), (1, 7)]


class TestThreadIter:
    def test_yields_all(self):
        ti = thread_iter(iter(range(100)), maxsize=4)
        assert list(ti) == list(range(100))

    def test_generator_chaining(self):
        a = thread_iter((i * 2 for i in range(20)))
        b = thread_iter((x + 1 for x in a))
        assert list(b) == [i * 2 + 1 for i in range(20)]


class TestProcessMap:
    def test_preserves_order(self):
        items = [(i, i) for i in range(20)]
        out = list(process_map(_square, iter(items), n_proc=3))
        assert out == [(i, i * i) for i in range(20)]


def _square(v):
    return v * v


class TestErrorPropagation:
    def test_thread_map_raises(self):
        def boom(v):
            if v == 5:
                raise ValueError("worker exploded")
            return v

        gen = thread_map(boom, iter([(i, i) for i in range(20)]), n_thread=3)
        with pytest.raises(ValueError, match="worker exploded"):
            list(gen)

    def test_process_map_raises(self):
        gen = process_map(_maybe_boom, iter([(i, i) for i in range(10)]),
                          n_proc=2)
        with pytest.raises(RuntimeError, match="process_map worker failed"):
            list(gen)


def _maybe_boom(v):
    if v == 3:
        raise ValueError("proc exploded")
    return v


def _swap(k, v):
    return (v, k)


class TestItemMaps:
    def test_thread_itemmap(self):
        from bonito_tpu.pipeline import thread_itemmap
        out = list(thread_itemmap(_swap, iter([("a", 1), ("b", 2)]),
                                  n_thread=2))
        assert out == [(1, "a"), (2, "b")]

    def test_process_itemmap(self):
        from bonito_tpu.pipeline import process_itemmap
        out = list(process_itemmap(_swap, iter([("a", 1), ("b", 2)]),
                                   n_proc=2))
        assert out == [(1, "a"), (2, "b")]


def _boom_on_zero(v):
    if v == 0:
        raise ValueError("first item exploded")
    import time
    time.sleep(0.005)
    return v


class TestFailFast:
    """A worker exception must abort the stream immediately — not after
    every remaining item is processed (round-2 VERDICT weak #6)."""

    def test_process_map_aborts_upstream_early(self):
        fed = []

        def items():
            for i in range(100_000):
                fed.append(i)
                yield (i, i)

        gen = process_map(_boom_on_zero, items(), n_proc=2, maxsize=2)
        with pytest.raises(RuntimeError, match="process_map worker failed"):
            list(gen)
        # upstream feeding stopped near the failure, not at end-of-stream
        assert len(fed) < 1000

    def test_thread_map_aborts_upstream_early(self):
        fed = []

        def items():
            for i in range(100_000):
                fed.append(i)
                yield (i, i)

        gen = thread_map(_boom_on_zero, items(), n_thread=2, maxsize=2)
        with pytest.raises(ValueError, match="first item exploded"):
            list(gen)
        assert len(fed) < 1000


class TestUpstreamErrorPropagation:
    """A raising upstream ITERATOR must terminate the stream with the
    error, not hang the consumer (the feeder thread previously died
    without delivering END sentinels)."""

    def _items(self):
        yield (0, 1)
        yield (1, 2)
        raise OSError("corrupt input file")

    def test_thread_map_upstream_raises(self):
        gen = thread_map(_square, self._items(), n_thread=2)
        with pytest.raises(OSError, match="corrupt input"):
            list(gen)

    def test_process_map_upstream_raises(self):
        gen = process_map(_square, self._items(), n_proc=2)
        with pytest.raises(OSError, match="corrupt input"):
            list(gen)


class TestProducerErrorPropagation:
    def test_thread_iter_reraises_producer_exception(self):
        from bonito_tpu.pipeline import thread_iter

        def gen():
            yield 1
            raise ValueError("producer blew up")

        it = thread_iter(gen())
        out = []
        import pytest
        with pytest.raises(ValueError, match="producer blew up"):
            for x in it:
                out.append(x)
        assert out == [1]


class TestMultiConsumerDrain:
    """Host pipeline feeding N>=2 simulated devices (round-5 host-feed
    dossier, scripts/host_feed_study.py): the chunk->batchify->prepare
    stream drained concurrently by multiple consumers at device-step
    cadence must hand every batch to exactly one consumer, keep payloads
    intact, and give every consumer work."""

    def _pipeline(self, n_reads=40, read_len=3000, chunksize=1000,
                  batchsize=16):
        import numpy as np
        from bonito_tpu.util import batchify, chunk
        rng = np.random.default_rng(7)
        sigs = [rng.normal(0, 1, read_len).astype(np.float32)
                for _ in range(n_reads)]
        chunks = thread_iter(
            ((i, 0, len(s)), chunk(s, chunksize, 100))
            for i, s in enumerate(sigs))
        return sigs, thread_iter(batchify(chunks, batchsize=batchsize))

    def test_two_consumers_partition_batches(self):
        import queue as queue_mod
        import threading

        import numpy as np

        sigs, batches = self._pipeline()
        q = queue_mod.Queue(maxsize=4)
        DONE = object()
        n_consumers = 2
        served = [[] for _ in range(n_consumers)]

        def pump():
            for idx, (spans, batch) in enumerate(batches):
                q.put((idx, spans, np.array(batch)))
            for _ in range(n_consumers):
                q.put(DONE)

        def consume(i):
            while True:
                item = q.get()
                if item is DONE:
                    return
                time.sleep(0.002)  # simulated device step
                served[i].append(item)

        threads = [threading.Thread(target=pump, daemon=True)]
        threads += [threading.Thread(target=consume, args=(i,), daemon=True)
                    for i in range(n_consumers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(not t.is_alive() for t in threads)

        # every consumer got work, and the union of served spans is a
        # partition of the read stream (each chunk row exactly once)
        assert all(len(s) > 0 for s in served)
        # spans are ((read_key, (batch_start, batch_end)), ...) with reads
        # split greedily across batches; replaying batches in stream
        # order (the pump's idx), a per-read counter recovers each row's
        # chunk index regardless of which consumer got the batch
        all_served = sorted((item for s in served for item in s),
                            key=lambda it: it[0])
        assert [idx for idx, _, _ in all_served] == list(
            range(len(all_served))), "a batch was dropped or duplicated"
        seen, next_k = {}, {}
        for _idx, spans, batch in all_served:
            for (rid, _s, _e), (bstart, bend) in spans:
                for row in range(bstart, bend):
                    k = next_k.get(rid, 0)
                    seen[(rid, k)] = batch[row]
                    next_k[rid] = k + 1
        from bonito_tpu.util import chunk as chunk_fn
        for rid, sig in enumerate(sigs):
            want = chunk_fn(sig, 1000, 100)
            for k in range(want.shape[0]):
                got = seen.pop((rid, k))
                np.testing.assert_array_equal(got, want[k])
        assert not seen
