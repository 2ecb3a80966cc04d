"""Bag-of-words place-recognition index tests."""

import numpy as np
import pytest

from steroscopic_hardware_tpu.ops.bow import BowIndex


def _desc(rng, k=64):
    return (rng.integers(0, 2, (k, 256)).astype(np.uint8),
            np.ones(k, bool))


def test_vector_unit_norm_and_deterministic(rng):
    ix = BowIndex()
    desc, valid = _desc(rng)
    v1 = ix.vector(desc, valid)
    v2 = ix.vector(desc, valid)
    assert np.array_equal(v1, v2)
    assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-5)
    # invalid descriptors contribute nothing
    v3 = ix.vector(desc, np.zeros_like(valid))
    assert np.all(v3 == 0)


def test_valid_mask_changes_vector(rng):
    ix = BowIndex()
    desc, valid = _desc(rng, k=128)
    half = valid.copy()
    half[64:] = False
    va = ix.vector(desc, valid)
    vh = ix.vector(desc, half)
    assert not np.array_equal(va, vh)


def test_query_self_top1(rng):
    ix = BowIndex()
    frames = [_desc(rng) for _ in range(6)]
    for d, v in frames:
        ix.add(d, v)
    for i, (d, v) in enumerate(frames):
        hits = ix.query(d, v, top_k=1)
        assert hits[0][0] == i
        assert hits[0][1] == pytest.approx(1.0, abs=1e-5)


def test_similar_beats_unrelated(rng):
    """A mildly corrupted copy of a stored frame must outrank unrelated
    frames."""
    ix = BowIndex()
    base, valid = _desc(rng, k=128)
    ix.add(base, valid)
    for _ in range(8):
        d, v = _desc(rng, k=128)
        ix.add(d, v)
    noisy = base.copy()
    flip = rng.random(noisy.shape) < 0.02  # flip 2% of bits
    noisy[flip] ^= 1
    hits = ix.query(noisy, valid, top_k=1)
    assert hits[0][0] == 0


def test_before_exclusion_and_empty(rng):
    ix = BowIndex()
    d, v = _desc(rng)
    assert ix.query(d, v) == []          # empty index
    ix.add(d, v)
    assert ix.query(d, v, before=0) == []  # temporal gap excludes all
    assert ix.query(d, v, before=1)[0][0] == 0


def test_capacity_growth(rng):
    ix = BowIndex(capacity=4)
    frames = [_desc(rng) for _ in range(11)]
    for d, v in frames:
        ix.add(d, v)
    assert ix.n == 11
    hits = ix.query(*frames[9], top_k=1)
    assert hits[0][0] == 9


def test_min_score_filters(rng):
    ix = BowIndex()
    d, v = _desc(rng)
    ix.add(d, v)
    other, ov = _desc(rng)
    # an unrelated random frame scores well below a self-match
    hits = ix.query(other, ov, top_k=1, min_score=0.99)
    assert hits == []


def test_bow_concurrent_add_query(rng):
    """BowIndex is internally thread-safe: a writer adding keyframes
    while a reader queries must never crash or return indices beyond
    the snapshot (the engine no longer serializes these behind its own
    lock — see models/slam.py round-4 notes)."""
    import threading

    from steroscopic_hardware_tpu.ops.bow import BowIndex

    idx = BowIndex(capacity=4)
    K = 64
    descs = [rng.integers(0, 2, (K, 256)).astype(np.uint8)
             for _ in range(30)]
    valid = np.ones(K, bool)
    errs = []

    def writer():
        try:
            for d in descs:
                idx.add(d, valid)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(20):
            for j, score in idx.query(descs[0], valid, top_k=3):
                assert 0 <= j < idx.n
    finally:
        t.join()
    assert not errs
    assert idx.n == len(descs)
