"""Parity tests for GateRv2 vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


def test_gaterv2_restoration():
    from resselt.archs.gaterv2.arch import GateRV2

    ref = init_random(
        GateRV2(in_ch=3, dim=16, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=2, scale=1), 171
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'GateRv2'
    assert model.metadata.upscale == 1
    x = np.random.default_rng(3).random((1, 13, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'gaterv2: max err {err}'


def test_gaterv2_sr_scale2():
    """SR variant: the reference loader crashes on these (reads the wrong
    MetaUpsample key) and its forward crops with scale 1; compare against
    the torch model's un-cropped upsampled output on aligned input."""
    from resselt.archs.gaterv2.arch import GateRV2

    ref = init_random(
        GateRV2(in_ch=3, dim=16, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=1,
                scale=2, upsample='pixelshuffledirect', upsample_mid_dim=16), 172
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.metadata.upscale == 2
    x = np.random.default_rng(3).random((1, 12, 16, 3), dtype=np.float32)
    # run the torch model's pipeline manually without the buggy crop
    import torch
    with torch.inference_mode():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        inp = ref.check_img_size(t, (12, 16))
        y = ref.in_to_dim(inp)
        shorts = []
        for block in ref.encode:
            y, s = block(y)
            shorts.append(s)
        y = ref.latent(y)
        shorts.reverse()
        for i in range(len(ref.decode)):
            y = ref.decode[i](y, shorts[i])
        y = ref.dim_to_in(y) + ref.short_to_dim(inp)
        want = ref.upsample(y).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'gaterv2 sr: max err {err}'
