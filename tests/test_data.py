"""Native C++ batch sampler vs the numpy fallback (resselt_tpu/data.py)."""

import numpy as np
import pytest

from resselt_tpu.data import CropSampler, Prefetcher, _native_lib


def _images(n=3, size=96, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (size, size + 7 * i, 3), np.uint8) for i in range(n)]


@pytest.mark.parametrize('backend', ['numpy', 'native'])
def test_sampler_contract(backend):
    if backend == 'native' and _native_lib() is None:
        pytest.skip('g++ unavailable')
    s = CropSampler(_images(), crop=32, scale=2, seed=7, backend=backend)
    assert s.backend == backend
    lr, hr = s.next_batch(8)
    assert hr.shape == (8, 32, 32, 3) and hr.dtype == np.float32
    assert lr.shape == (8, 16, 16, 3)
    assert 0.0 <= hr.min() and hr.max() <= 1.0
    # HR values must be exact uint8/255 grid points
    q = hr * 255.0
    np.testing.assert_allclose(q, np.round(q), atol=1e-4)
    # LR must be the exact box mean of the HR crop
    box = hr.reshape(8, 16, 2, 16, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(lr, box, atol=1e-6)
    # batches vary
    lr2, hr2 = s.next_batch(8)
    assert not np.array_equal(hr, hr2)


def test_native_sampler_deterministic_and_thread_invariant():
    if _native_lib() is None:
        pytest.skip('g++ unavailable')
    imgs = _images()
    a = CropSampler(imgs, crop=32, scale=4, seed=3, backend='native', n_threads=1)
    b = CropSampler(imgs, crop=32, scale=4, seed=3, backend='native', n_threads=8)
    for _ in range(3):
        la, ha = a.next_batch(16)
        lb, hb = b.next_batch(16)
        np.testing.assert_array_equal(ha, hb)
        np.testing.assert_array_equal(la, lb)


def test_prefetcher():
    s = CropSampler(_images(), crop=16, scale=2, seed=0, backend='numpy')
    p = Prefetcher(s, batch=4)
    try:
        for _ in range(3):
            lr, hr = p.next()
            assert lr.shape == (4, 8, 8, 3) and hr.shape == (4, 16, 16, 3)
    finally:
        p.close()


def test_prefetcher_propagates_producer_errors():
    """If the sampler raises, next() must raise the real error instead of
    blocking forever on an empty queue (regression)."""

    class Boom:
        def next_batch(self, n):
            raise RuntimeError('corrupt image')

    p = Prefetcher(Boom(), batch=4)
    try:
        with pytest.raises(RuntimeError, match='corrupt image'):
            p.next()
    finally:
        p.close()


def test_sampler_validation():
    with pytest.raises(ValueError):
        CropSampler(_images(), crop=33, scale=2)
    with pytest.raises(ValueError):
        CropSampler(_images(size=8), crop=32, scale=2)
