#!/usr/bin/env python
"""jnp.fft.rfft2/irfft2 vs DFT-as-matmul on the live chip.

gfisr/gfisrv2/figsr/lawfft all run rfft2 -> pointwise -> irfft2 at
(b, c, H, W) SR shapes (reference gfisr/arch.py:416-472,
lawfft/arch.py:245-307).  XLA's TPU FFT is scalar-unit work; a DFT at
H, W <= 512 is a handful of MXU matmuls with trace-time-constant DFT
matrices.  This times a roundtrip (rfft2 -> scale -> irfft2), amortized
4 ops/iteration, both formulations, plus a numerical check.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from tools.probe_conv3x3_lk import bench_loop  # noqa: E402

B, C, H, W = 8, 64, 256, 256


def dft_mats(h, w):
    """Trace-time numpy DFT matrices for ortho rfft2 / irfft2 at (h, w)."""
    wh = w // 2 + 1
    n = np.arange(w)[:, None]
    k = np.arange(wh)[None, :]
    fw = np.exp(-2j * np.pi * n * k / w) / np.sqrt(w)  # (w, wh)
    m = np.arange(h)[:, None]
    kh = np.arange(h)[None, :]
    fh = np.exp(-2j * np.pi * m * kh / h) / np.sqrt(h)  # (h, h)
    # inverse: along h, conj; along w, Hermitian-weighted transpose back
    gh = np.conj(fh)  # (h_freq, h_out) used as fh^H
    wgt = np.ones(wh)
    wgt[1 : wh - 1 if w % 2 == 0 else wh] = 2.0
    gw = np.exp(2j * np.pi * k.T * n.T / w) / np.sqrt(w) * wgt[:, None]  # (wh, w)
    return fw, fh, gh, gw


def make_ops(h, w):
    import jax.numpy as jnp

    fw, fh, gh, gw = dft_mats(h, w)
    fw_re, fw_im = jnp.asarray(fw.real, jnp.float32), jnp.asarray(fw.imag, jnp.float32)
    fh_re, fh_im = jnp.asarray(fh.real, jnp.float32), jnp.asarray(fh.imag, jnp.float32)
    gh_re, gh_im = jnp.asarray(gh.real, jnp.float32), jnp.asarray(gh.imag, jnp.float32)
    gw_re, gw_im = jnp.asarray(gw.real, jnp.float32), jnp.asarray(gw.imag, jnp.float32)

    def rfft2_mm(x):
        # x: (..., h, w) real f32 -> (re, im) of shape (..., h, w//2+1)
        xw_re = x @ fw_re
        xw_im = x @ fw_im
        # contract h axis: einsum '...hk,hm->...mk'
        y_re = jnp.einsum('...hk,hm->...mk', xw_re, fh_re) - jnp.einsum('...hk,hm->...mk', xw_im, fh_im)
        y_im = jnp.einsum('...hk,hm->...mk', xw_re, fh_im) + jnp.einsum('...hk,hm->...mk', xw_im, fh_re)
        return y_re, y_im

    def irfft2_mm(y_re, y_im):
        z_re = jnp.einsum('...hk,hm->...mk', y_re, gh_re) - jnp.einsum('...hk,hm->...mk', y_im, gh_im)
        z_im = jnp.einsum('...hk,hm->...mk', y_re, gh_im) + jnp.einsum('...hk,hm->...mk', y_im, gh_re)
        return z_re @ gw_re - z_im @ gw_im

    return rfft2_mm, irfft2_mm


def main():
    import jax
    import jax.numpy as jnp

    print('devices:', jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    rfft2_mm, irfft2_mm = make_ops(H, W)

    # correctness vs host numpy FFT (complex ops outside jit are
    # unimplemented on the axon backend)
    xn = np.random.default_rng(0).standard_normal((2, 4, H, W)).astype(np.float32)
    refn = np.fft.rfft2(xn, norm='ortho')
    got_re, got_im = jax.jit(rfft2_mm)(jnp.asarray(xn))
    err_f = float(np.max(np.abs(np.asarray(got_re) - refn.real)) + np.max(np.abs(np.asarray(got_im) - refn.imag)))
    rt = jax.jit(irfft2_mm)(got_re, got_im)
    err_rt = float(np.max(np.abs(np.asarray(rt) - xn)))
    print(f'fwd abs err {err_f:.3e}   roundtrip abs err {err_rt:.3e}', flush=True)

    flops = 0  # report ms only; useful-flop accounting differs per formulation

    def make_x():
        return jax.random.normal(key, (B, C, H, W), jnp.float32)

    def fft_body(_, x):
        for _i in range(4):
            f = jnp.fft.rfft2(x, norm='ortho')
            x = jnp.fft.irfft2(f * (1.0 + 1e-6), s=(H, W), norm='ortho')
        return x

    def mm_body(_, x):
        for _i in range(4):
            re, im = rfft2_mm(x)
            x = irfft2_mm(re * (1.0 + 1e-6), im * (1.0 + 1e-6))
        return x

    bench_loop(fft_body, make_x, 1e9, f'jnp.fft roundtrip   ({B},{C},{H},{W})')
    bench_loop(mm_body, make_x, 1e9, f'DFT-matmul roundtrip({B},{C},{H},{W})')

    # lawfft FSAS-style: two rffts + complex mul + irfft at dim 2*dim
    def fsas_fft(_, x):
        for _i in range(2):
            qf = jnp.fft.rfft2(x)
            kf = jnp.fft.rfft2(x * 0.5)
            x = jnp.fft.irfft2(qf * kf, s=(H, W))
        return x

    bench_loop(fsas_fft, make_x, 1e9, 'FSAS-style fft corr (2 ops/it)')


if __name__ == '__main__':
    main()
