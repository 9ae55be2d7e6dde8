"""Parity tests for FlexNet vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('pipeline,upsampler,scale,channel_norm', [
    ('linear', 'ps', 2, False),
    ('linear', 'n+c', 4, True),
    ('linear', 'dys', 2, False),
    ('meta', 'ps', 2, False),
])
def test_flexnet(pipeline, upsampler, scale, channel_norm):
    from resselt.archs.flexnet.arch import FlexNet

    nb = (1, 1, 1, 1) if pipeline == 'meta' else (3, 2)
    ref = init_random(
        FlexNet(inp_channels=3, out_channels=3, scale=scale, dim=16,
                num_blocks=list(nb), window_size=8, hidden_rate=2,
                channel_norm=channel_norm, pipeline_type=pipeline, upsampler=upsampler), 151
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'FlexNet'
    assert model.metadata.upscale == scale
    assert model.config.pipeline_type == pipeline
    size = (1, 40, 70, 3) if pipeline == 'meta' else (1, 11, 14, 3)
    x = np.random.default_rng(3).random(size, dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'flexnet {pipeline}/{upsampler}: max err {err}'
