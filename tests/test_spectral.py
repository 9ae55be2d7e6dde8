"""Matmul-DFT rfft2/irfft2 (nn/spectral.py) vs numpy's pocketfft."""

import numpy as np
import pytest

import jax.numpy as jnp

from resselt_tpu.nn import spectral


@pytest.mark.parametrize('norm', ['backward', 'ortho'])
@pytest.mark.parametrize('h,w', [(16, 16), (12, 18), (9, 16), (16, 9), (7, 7)])
def test_rfft2_planes_matches_numpy(h, w, norm):
    x = np.random.default_rng(0).standard_normal((2, 3, h, w)).astype(np.float32)
    re, im = spectral.rfft2_planes(jnp.asarray(x), norm=norm)
    ref = np.fft.rfft2(x, norm=norm)
    assert np.max(np.abs(np.asarray(re) - ref.real)) < 1e-4
    assert np.max(np.abs(np.asarray(im) - ref.imag)) < 1e-4


@pytest.mark.parametrize('norm', ['backward', 'ortho'])
@pytest.mark.parametrize('h,w', [(16, 16), (12, 18), (9, 16), (16, 9), (7, 7)])
def test_irfft2_planes_matches_numpy_non_hermitian(h, w, norm):
    # arbitrary (non-Hermitian-consistent) half-spectra, as produced by the
    # gated FourierUnits that convolve the re/im planes
    rng = np.random.default_rng(1)
    wh = w // 2 + 1
    re = rng.standard_normal((2, 3, h, wh)).astype(np.float32)
    im = rng.standard_normal((2, 3, h, wh)).astype(np.float32)
    got = spectral.irfft2_planes(jnp.asarray(re), jnp.asarray(im), s=(h, w), norm=norm)
    ref = np.fft.irfft2(re + 1j * im, s=(h, w), norm=norm)
    assert np.max(np.abs(np.asarray(got) - ref)) < 1e-4


def test_roundtrip_and_fallback_agree():
    x = np.random.default_rng(2).standard_normal((1, 2, 24, 20)).astype(np.float32)
    re, im = spectral.rfft2_planes(jnp.asarray(x), norm='ortho')
    rt = spectral.irfft2_planes(re, im, s=(24, 20), norm='ortho')
    assert np.max(np.abs(np.asarray(rt) - x)) < 1e-4

    spectral.use_mm_dft(False)
    try:
        re2, im2 = spectral.rfft2_planes(jnp.asarray(x), norm='ortho')
        rt2 = spectral.irfft2_planes(re2, im2, s=(24, 20), norm='ortho')
    finally:
        spectral.use_mm_dft(True)
    assert np.max(np.abs(np.asarray(re2) - np.asarray(re))) < 1e-4
    assert np.max(np.abs(np.asarray(rt2) - np.asarray(rt))) < 1e-4


def test_unsupported_sizes_fall_back():
    assert not spectral.mm_dft_supported(2048, 16)
    x = np.random.default_rng(3).standard_normal((1, 4, 8)).astype(np.float32)
    re, im = spectral.rfft2_planes(jnp.asarray(x))  # 'backward' default
    ref = np.fft.rfft2(x)
    assert np.max(np.abs(np.asarray(re) - ref.real)) < 1e-4
    got = spectral.irfft2_planes(re, im, s=(4, 8))
    ref2 = np.fft.irfft2(ref, s=(4, 8))
    assert np.max(np.abs(np.asarray(got) - ref2)) < 1e-4
