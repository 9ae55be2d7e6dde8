"""2-D real FFTs as MXU matmuls (trace-time DFT matrices).

XLA's TPU FFT lowering runs far below the chip's matmul rate at SR
feature-map sizes: a (8, 64, 256, 256) f32 rfft2+irfft2 roundtrip costs
7.3 ms via ``jnp.fft`` but 4.1 ms as HIGHEST-precision matmuls against
constant DFT matrices (1.8x; default-precision matmuls reach 4.5x but
their bf16 passes add ~2e-2 abs error — unusable for parity).  See
``tools/probe_fft.py``.

Used by the FourierUnit/FSAS blocks of gfisr/gfisrv2/figsr/lawfft
(reference ``gfisr/arch.py:416-472``, ``lawfft/arch.py:245-307``).
Those blocks immediately split the spectrum into real/imag planes, so
the API here is plane-based — no complex arrays (the axon backend also
lacks complex support outside jit).

Numerics: abs err ~1e-6 vs ``np.fft`` on N(0,1) data (HIGHEST uses
f32-emulation matmul passes), validated in ``tests/test_spectral.py``
including non-Hermitian spectra (the gated FourierUnits modify the
half-spectrum arbitrarily; like ``np.fft.irfft``, only the real parts
of the DC/Nyquist columns can influence a real inverse, which the
matmul form reproduces by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MM_DFT = True


def use_mm_dft(on: bool) -> None:
    """Route rfft2/irfft2 through the matmul-DFT path (kill switch —
    mirrors nn.window.use_fused_attention; keyed into jit caches via
    core.factory._dispatch_flags)."""
    global _MM_DFT
    _MM_DFT = bool(on)


def mm_dft_enabled() -> bool:
    return _MM_DFT


def mm_dft_supported(h: int, w: int) -> bool:
    """Shape predicate: DFT matrices are trace-time constants, so cap the
    axis length (a 1024-point axis costs a 1024x1024 constant per
    direction; beyond that jnp.fft wins on memory and flops)."""
    return 2 <= h <= 1024 and 2 <= w <= 1024


@functools.lru_cache(maxsize=32)
def _dft_mats(h: int, w: int, norm: str):
    """(fw_re, fw_im, fh_re, fh_im) forward and (gh_re, gh_im, gw_re,
    gw_im) inverse matrices for an rfft2/irfft2 pair at (h, w).

    Forward: X = Fh^T x Fw  (contract h then w); half-spectrum along w.
    Inverse: x = Re(Gh^T X Gw) with Hermitian bin weights folded into Gw.
    """
    wh = w // 2 + 1
    n = np.arange(w)[:, None]
    k = np.arange(wh)[None, :]
    m = np.arange(h)[:, None]
    kh = np.arange(h)[None, :]
    if norm == 'ortho':
        sfw = siw = 1.0 / np.sqrt(w)
        sfh = sih = 1.0 / np.sqrt(h)
    elif norm == 'backward':
        sfw = sfh = 1.0
        siw, sih = 1.0 / w, 1.0 / h
    else:  # pragma: no cover - only the two norms the archs use
        raise ValueError(f'unsupported norm {norm!r}')
    fw = np.exp(-2j * np.pi * n * k / w) * sfw            # (w, wh)
    fh = np.exp(-2j * np.pi * m * kh / h) * sfh           # (h, h)
    gh = np.conj(np.exp(-2j * np.pi * m * kh / h)) * sih  # (h, h) full inverse
    wgt = np.ones(wh)
    wgt[1 : wh - 1 if w % 2 == 0 else wh] = 2.0           # Hermitian doubling
    gw = np.exp(2j * np.pi * k.T * n.T / w) * siw * wgt[:, None]  # (wh, w)
    to = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return (to(fw.real), to(fw.imag), to(fh.real), to(fh.imag),
            to(gh.real), to(gh.imag), to(gw.real), to(gw.imag))


_P = jax.lax.Precision.HIGHEST


def _mm_last(x, m):
    """Contract the last axis: (..., a) @ (a, b) -> (..., b)."""
    return jax.lax.dot_general(x, m, (((x.ndim - 1,), (0,)), ((), ())), precision=_P)


def _mm_h(x, m):
    """Contract the second-to-last axis: (..., h, k), (h, m) -> (..., m, k)."""
    return jnp.einsum('...hk,hm->...mk', x, m, precision=_P)


def rfft2_planes(x, norm: str = 'backward'):
    """rfft2 over the last two axes of a real array -> (re, im) planes of
    shape (..., h, w//2+1), f32.  Matches ``jnp.fft.rfft2(x, norm=norm)``."""
    h, w = x.shape[-2], x.shape[-1]
    x = x.astype(jnp.float32)
    if not (_MM_DFT and mm_dft_supported(h, w)):
        f = jnp.fft.rfft2(x, norm=norm)
        return jnp.real(f), jnp.imag(f)
    fw_re, fw_im, fh_re, fh_im = [jnp.asarray(a) for a in _dft_mats(h, w, norm)[:4]]
    xw_re = _mm_last(x, fw_re)
    xw_im = _mm_last(x, fw_im)
    y_re = _mm_h(xw_re, fh_re) - _mm_h(xw_im, fh_im)
    y_im = _mm_h(xw_re, fh_im) + _mm_h(xw_im, fh_re)
    return y_re, y_im


def irfft2_planes(re, im, s, norm: str = 'backward'):
    """irfft2 of a half-spectrum given as (re, im) planes -> real array of
    shape (..., *s).  Matches ``jnp.fft.irfft2(re + 1j*im, s=s, norm=norm)``
    for any planes, Hermitian-consistent or not."""
    h, w = int(s[0]), int(s[1])
    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    if not (_MM_DFT and mm_dft_supported(h, w)):
        return jnp.fft.irfft2(jax.lax.complex(re, im), s=(h, w), norm=norm)
    gh_re, gh_im, gw_re, gw_im = [jnp.asarray(a) for a in _dft_mats(h, w, norm)[4:]]
    z_re = _mm_h(re, gh_re) - _mm_h(im, gh_im)
    z_im = _mm_h(re, gh_im) + _mm_h(im, gh_re)
    return _mm_last(z_re, gw_re) - _mm_last(z_im, gw_im)
