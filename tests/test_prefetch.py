"""Pipelined host-plumbing pool (data/prefetch.pipelined_map).

The plumbing+wgeom build is the host-side cost that must overlap device
steps (150-360 ms/batch at scale, PERF.md round 3); it runs on a thread
pool because it is pure numpy/C++ (GIL-releasing) and deterministic, while
sample fetch stays serial (datasets share one RandomState).
"""

import threading
import time

import numpy as np
import pytest

from u2mkd_tpu.data.prefetch import pipelined_map


def test_order_preserved():
    def slow_sq(x):
        # reverse sleep times: later items finish first without ordering
        time.sleep(0.05 * (8 - x) / 8)
        return x * x

    out = list(pipelined_map(slow_sq, range(8), workers=4))
    assert out == [x * x for x in range(8)]


def test_exception_propagates():
    def boom(x):
        if x == 3:
            raise ValueError("x3")
        return x

    with pytest.raises(ValueError, match="x3"):
        list(pipelined_map(boom, range(8), workers=2))


def test_bounded_in_flight():
    live = []
    peak = []
    lock = threading.Lock()

    def track(x):
        with lock:
            live.append(x)
            peak.append(len(live))
        time.sleep(0.02)
        with lock:
            live.remove(x)
        return x

    list(pipelined_map(track, range(20), workers=3, depth=4))
    assert max(peak) <= 4


def test_actually_parallel():
    def sleepy(x):
        time.sleep(0.1)
        return x

    t0 = time.time()
    out = list(pipelined_map(sleepy, range(8), workers=8))
    dt = time.time() - t0
    assert out == list(range(8))
    assert dt < 0.6  # serial would be 0.8s


def test_epoch_iter_workers_parity():
    """Thread-pooled plumbing produces byte-identical batches to serial."""
    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.data.loaders import _epoch_iter

    class DS:
        def __init__(self):
            self.rng = np.random.RandomState(0)
            self.items = [synthetic.make_batch(
                np.random.RandomState(i), 1, 256, voxel_size=0.2)
                for i in range(6)]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return {k: v[0] for k, v in self.items[i].items()}

    def collate(samples):
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    caps = (256, 128, 64, 32, 16)

    def run(workers):
        ds = DS()
        rng = np.random.RandomState(7)
        return list(_epoch_iter(ds, 2, collate, True, rng, lambda x: x,
                                plumbing_caps=caps, workers=workers))

    serial = run(0)
    pooled = run(4)
    assert len(serial) == len(pooled) == 3
    for a, b in zip(serial, pooled):
        flat_a, _ = _flatten(a)
        flat_b, _ = _flatten(b)
        assert len(flat_a) == len(flat_b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _flatten(tree):
    import jax

    return jax.tree_util.tree_flatten(tree)


def test_prefetch_close_stops_worker():
    """Closing a prefetch generator stops the worker from driving the
    source (an abandoned epoch iterator would otherwise keep augmenting
    batches in the background, racing a fresh iterator over the same
    dataset RandomState — the evaluate.py init-sample pattern)."""
    from u2mkd_tpu.data.prefetch import prefetch

    produced = []
    done = threading.Event()

    def src():
        for i in range(1000):
            produced.append(i)
            yield i
        done.set()

    gen = prefetch(src(), depth=2)
    first = next(gen)
    assert first == 0
    gen.close()
    n_at_close = len(produced)
    time.sleep(0.5)
    # worker must have stopped: no unbounded consumption after close
    assert len(produced) <= n_at_close + 2
    assert not done.is_set()


def test_prefetch_sentinel_survives_full_queue():
    """End-of-epoch must reach a slow consumer even when the queue is full.

    Regression: the worker used ``put_nowait`` for the end-of-iteration
    sentinel, which silently dropped it whenever the consumer lagged (queue
    full at source exhaustion — i.e. any epoch whose device step was slower
    than the loader). The consumer then blocked in ``q.get()`` forever and
    training hung at every epoch boundary."""
    from u2mkd_tpu.data.prefetch import prefetch

    got = []
    finished = threading.Event()

    def consume():
        # depth=1: the worker fills the queue instantly, then exhausts the
        # source while the queue is still full — the exact drop window.
        for item in prefetch(iter(range(3)), depth=1):
            time.sleep(0.3)  # consumer slower than producer
            got.append(item)
        finished.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert finished.wait(10.0), "consumer hung: end-of-epoch sentinel lost"
    assert got == [0, 1, 2]


def test_prefetch_close_unwinds_pipeline():
    """close() propagates through maybe_pipelined so the thread pool and
    the source generator are shut down too."""
    from u2mkd_tpu.data.prefetch import maybe_pipelined, prefetch

    consumed = []

    def src():
        for i in range(1000):
            consumed.append(i)
            yield i

    gen = prefetch(maybe_pipelined(lambda x: x + 1, src(), workers=2), depth=2)
    assert next(gen) == 1
    gen.close()
    n = len(consumed)
    time.sleep(0.5)
    assert len(consumed) <= n + 8  # pool depth worth of slack, no more


def test_process_pipelined_map_matches_inline():
    """Process-pool plumbing stage (VERDICT r3 next #3): identical results
    to the inline build, through real fork + pickle round-trips."""
    import numpy as np

    from u2mkd_tpu.data import plumbing_host, synthetic
    from u2mkd_tpu.data.loaders import PlumbingStage
    from u2mkd_tpu.data.prefetch import process_pipelined_map

    caps = (256, 128, 64, 32, 16)
    rng = np.random.RandomState(0)
    batches = [synthetic.make_batch(np.random.RandomState(i), 1, 256,
                                    voxel_size=0.2) for i in range(3)]
    stage = PlumbingStage(caps)
    got = list(process_pipelined_map(stage, iter(batches), workers=2))
    assert len(got) == 3
    for i, b in enumerate(got):
        want = plumbing_host.batch_plumbing(
            batches[i]["pcoords"], batches[i]["xyz"], batches[i]["pmask"],
            caps)
        for k in want:
            for li, arr in enumerate(want[k]):
                np.testing.assert_array_equal(b["plumbing"][k][li], arr)


def test_plumbing_stage_tsd_concurrent_feeds():
    """TSD stage builds both feeds (concurrently) and matches serial."""
    import numpy as np

    from u2mkd_tpu.data import plumbing_host, synthetic
    from u2mkd_tpu.data.loaders import PlumbingStage

    s_caps = (192, 96, 48, 24, 12)
    t_caps = (256, 128, 64, 32, 16)
    raw = synthetic.make_multimodal_batch(np.random.RandomState(1), 1, 192,
                                          256, voxel_size=0.3, num_cams=2,
                                          im_hw=(16, 24))
    stage = PlumbingStage(None, tsd_caps={"student": s_caps,
                                          "teacher": t_caps})
    out = stage(dict(raw))
    for key, caps in (("student", s_caps), ("teacher", t_caps)):
        want = plumbing_host.batch_plumbing(
            raw[key]["pcoords"], raw[key]["xyz"], raw[key]["pmask"], caps)
        got = out[key]["plumbing"]
        for k in want:
            for li, arr in enumerate(want[k]):
                np.testing.assert_array_equal(got[k][li], arr)
