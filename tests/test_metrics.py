"""PSNR/SSIM metrics: invariants + an independent numpy SSIM oracle."""

import numpy as np
import pytest

from resselt_tpu.metrics import psnr, rgb_to_y, ssim


def _np_ssim(a, b):
    """Independent SSIM oracle: direct (non-separable) numpy implementation
    of Wang et al. 2004 with an 11x11 sigma-1.5 Gaussian, valid windows,
    population covariance — per channel, averaged."""
    g1 = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g1 /= g1.sum()
    win = np.outer(g1, g1)
    c1, c2 = 0.01**2, 0.03**2

    def filt(x):
        H, W = x.shape
        out = np.empty((H - 10, W - 10))
        for i in range(H - 10):
            for j in range(W - 10):
                out[i, j] = (x[i:i + 11, j:j + 11] * win).sum()
        return out

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c].astype(np.float64), b[..., c].astype(np.float64)
        mx, my = filt(x), filt(y)
        sxx = filt(x * x) - mx * mx
        syy = filt(y * y) - my * my
        sxy = filt(x * y) - mx * my
        m = ((2 * mx * my + c1) * (2 * sxy + c2)) / ((mx**2 + my**2 + c1) * (sxx + syy + c2))
        vals.append(m.mean())
    return float(np.mean(vals))


def test_psnr_basics():
    rng = np.random.default_rng(0)
    a = rng.random((16, 18, 3)).astype(np.float32)
    assert psnr(a, a) >= 120.0  # identical -> mse floor
    b = np.clip(a + 0.1, 0, 1)
    # uniform +0.1 where no clipping: psnr <= 20 dB
    assert psnr(a * 0.8, a * 0.8 + 0.1) == pytest.approx(20.0, abs=0.01)
    assert psnr(a, b) < psnr(a, np.clip(a + 0.01, 0, 1))


def test_psnr_crop_border():
    a = np.zeros((12, 12, 1), np.float32)
    b = a.copy()
    b[0, 0, 0] = 1.0  # corrupt only the border
    assert psnr(a, b, crop_border=2) >= 120.0
    assert psnr(a, b) < 60.0


def test_rgb_to_y_bt601():
    px = np.ones((1, 1, 3), np.float32)
    y = np.asarray(rgb_to_y(px))[0, 0, 0, 0]
    assert y == pytest.approx((65.481 + 128.553 + 24.966 + 16.0) / 255.0, abs=1e-5)


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(1)
    a = rng.random((24, 26, 3)).astype(np.float32)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-5)
    noisy1 = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
    noisy2 = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    assert 1.0 > ssim(a, noisy1) > ssim(a, noisy2)


def test_ssim_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    a = rng.random((20, 22, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = ssim(a, b)
    want = _np_ssim(a, b)
    assert got == pytest.approx(want, abs=2e-5)


def test_ssim_y_channel_and_errors():
    rng = np.random.default_rng(3)
    a = rng.random((16, 16, 3)).astype(np.float32)
    b = np.clip(a + 0.03, 0, 1).astype(np.float32)
    assert 0 < ssim(a, b, test_y_channel=True) < 1
    with pytest.raises(ValueError):
        ssim(a[:8], b[:8])  # smaller than the window after nothing? 8 < 11
    with pytest.raises(ValueError):
        psnr(a, b[:8])
