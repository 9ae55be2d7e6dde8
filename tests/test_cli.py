"""CLI-level tests: channel adaptation (RGBA/grayscale), batch mode, convert."""

import numpy as np
import pytest

import resselt_tpu
from resselt_tpu.cache import save_model
from resselt_tpu.upscale import adapt_channels, main as upscale_main
from resselt_tpu.zoo import make_compact


def _save_png(path, arr, mode=None):
    from PIL import Image

    Image.fromarray(arr, mode).save(path)


def test_adapt_channels():
    rgb = np.random.default_rng(0).random((6, 7, 3)).astype(np.float32)
    rgba = np.concatenate([rgb, np.full((6, 7, 1), 0.5, np.float32)], axis=-1)

    main, alpha = adapt_channels(rgb, 3)
    assert main.shape == (6, 7, 3) and alpha is None

    main, alpha = adapt_channels(rgba, 3)
    assert main.shape == (6, 7, 3) and alpha.shape == (6, 7, 1)

    main, alpha = adapt_channels(rgb, 1)
    assert main.shape == (6, 7, 1) and alpha is None
    np.testing.assert_allclose(main[..., 0], rgb @ np.asarray([0.299, 0.587, 0.114], np.float32), atol=1e-6)

    main, alpha = adapt_channels(rgb, 4)
    assert main.shape == (6, 7, 4) and alpha is None
    np.testing.assert_allclose(main[..., 3], 1.0)

    with pytest.raises(ValueError):
        adapt_channels(rgb, 2)


def test_cli_rgba_and_gray(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    model3 = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(model3, str(tmp_path / 'c3.npz'))
    model1 = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2, in_nc=1))
    save_model(model1, str(tmp_path / 'c1.npz'))

    _save_png(str(tmp_path / 'rgba.png'), (rng.random((20, 24, 4)) * 255).astype('uint8'), 'RGBA')
    _save_png(str(tmp_path / 'rgb.png'), (rng.random((20, 24, 3)) * 255).astype('uint8'))

    assert upscale_main([str(tmp_path / 'c3.npz'), str(tmp_path / 'rgba.png'), str(tmp_path / 'o1.png')]) == 0
    out = Image.open(tmp_path / 'o1.png')
    assert out.mode == 'RGBA' and out.size == (48, 40)

    assert upscale_main([str(tmp_path / 'c1.npz'), str(tmp_path / 'rgb.png'), str(tmp_path / 'o2.png')]) == 0
    out = Image.open(tmp_path / 'o2.png')
    assert out.mode == 'L' and out.size == (48, 40)


def test_cli_batch_and_convert(tmp_path):
    import os

    from resselt_tpu.convert import main as convert_main

    rng = np.random.default_rng(2)
    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(model, str(tmp_path / 'm.npz'))

    src = tmp_path / 'in'
    src.mkdir()
    for i in range(3):
        _save_png(str(src / f'{i}.png'), (rng.random((12, 12, 3)) * 255).astype('uint8'))
    dst = tmp_path / 'out'
    assert upscale_main([str(tmp_path / 'm.npz'), str(src), str(dst)]) == 0
    assert sorted(os.listdir(dst)) == ['0.png', '1.png', '2.png']


def test_cli_arbitrary_scale_flag(tmp_path):
    """--scale picks a tail on an arbitrary-scale (SpanPP IGConv) checkpoint
    and rejects scales outside the checkpoint's list."""
    from tests.torch_ref import init_random, state_dict_to_numpy
    from resselt.archs.spanpp.arch import SpanPP

    ref = init_random(
        SpanPP(num_in_ch=3, feature_channels=16, scale_list=(1, 2, 3, 4),
               eval_base_scale=2, ig_kernel_size=3, implicit_dim=32, latent_layers=2), 5
    ).eval()
    model = resselt_tpu.load_from_state_dict(state_dict_to_numpy(ref.state_dict()))
    save_model(model, str(tmp_path / 's.npz'))
    _save_png(str(tmp_path / 'in.png'),
              (np.random.default_rng(6).random((12, 14, 3)) * 255).astype('uint8'))

    from PIL import Image

    for s in (2, 3):
        out = str(tmp_path / f'out{s}.png')
        assert upscale_main([str(tmp_path / 's.npz'), str(tmp_path / 'in.png'), out,
                             '--scale', str(s)]) == 0
        assert Image.open(out).size == (14 * s, 12 * s)
    assert upscale_main([str(tmp_path / 's.npz'), str(tmp_path / 'in.png'),
                         str(tmp_path / 'bad.png'), '--scale', '8']) == 1

    # --scale combined with the tiled driver: with_config(eval_scale=...)
    # must narrow metadata.upscale to the chosen int or the tiled/padded
    # drivers reject the scale list (regression: crashed before r3 fix)
    out = str(tmp_path / 'out3t.png')
    assert upscale_main([str(tmp_path / 's.npz'), str(tmp_path / 'in.png'), out,
                         '--scale', '3', '--tile', '8', '--halo', '4']) == 0
    assert Image.open(out).size == (14 * 3, 12 * 3)

    # fixed-scale model: --scale matching its scale is a no-op, others error
    cm = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(cm, str(tmp_path / 'c.npz'))
    assert upscale_main([str(tmp_path / 'c.npz'), str(tmp_path / 'in.png'),
                         str(tmp_path / 'ok.png'), '--scale', '2']) == 0
    assert upscale_main([str(tmp_path / 'c.npz'), str(tmp_path / 'in.png'),
                         str(tmp_path / 'bad2.png'), '--scale', '3']) == 1


def test_cli_tile_auto(tmp_path):
    """--tile auto resolves to the arch's serving_tile hint (compact has
    none -> 256, so a small image runs whole); bad values error cleanly."""
    from PIL import Image

    rng = np.random.default_rng(8)
    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(model, str(tmp_path / 'm.npz'))
    _save_png(str(tmp_path / 'in.png'), (rng.random((20, 24, 3)) * 255).astype('uint8'))

    out = str(tmp_path / 'o.png')
    assert upscale_main([str(tmp_path / 'm.npz'), str(tmp_path / 'in.png'), out,
                         '--tile', 'auto']) == 0
    assert Image.open(out).size == (48, 40)
    assert upscale_main([str(tmp_path / 'm.npz'), str(tmp_path / 'in.png'),
                         str(tmp_path / 'bad.png'), '--tile', 'huge']) == 1


def test_safetensors_writer_roundtrip(tmp_path):
    """write_safetensors output must be readable by our reader, by the
    official safetensors library, and re-detectable end-to-end."""
    import jax.numpy as jnp

    from resselt_tpu.convert import main as convert_main
    from resselt_tpu.io import read_safetensors, write_safetensors

    sd = {
        'a.weight': np.random.default_rng(0).standard_normal((4, 3, 3, 3)).astype(np.float32),
        'a.bias': np.arange(4, dtype=np.float32),
        'marker': np.zeros((1,), np.uint8),
        'jaxval': jnp.ones((2, 2), jnp.float32) * 3,
        'bf16': jnp.ones((2,), jnp.bfloat16) * 1.5,
    }
    p = str(tmp_path / 'w.safetensors')
    write_safetensors(sd, p, metadata={'k': 'v'})

    back = read_safetensors(p)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(back[k], np.float32), np.asarray(sd[k], np.float32))

    from safetensors import safe_open

    with safe_open(p, framework='np') as f:
        assert f.metadata() == {'k': 'v'}
        np.testing.assert_array_equal(f.get_tensor('a.bias'), sd['a.bias'])

    # end-to-end: convert a detected model to safetensors, reload, same output
    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in make_compact(num_feat=16, num_conv=2, upscale=2).items()},
               str(tmp_path / 'm.pth'))
    out_st = str(tmp_path / 'm.safetensors')
    assert convert_main([str(tmp_path / 'm.pth'), out_st]) == 0
    model2 = resselt_tpu.load_from_file(out_st)
    assert model2.arch_id == 'Compact'
    x = np.random.default_rng(3).random((12, 12, 3), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(model2(x)), atol=1e-6)


def test_inspect_cli(tmp_path, capsys):
    import json as _json

    from resselt_tpu.inspect import main as inspect_main

    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(model, str(tmp_path / 'm.npz'))
    assert inspect_main([str(tmp_path / 'm.npz'), '--size', '32', '32', '--json']) == 0
    info = _json.loads(capsys.readouterr().out.strip())
    assert info['arch'] == 'Compact'
    assert info['upscale'] == 2
    assert info['params'] > 0
    assert info['cost_at_size']['gflops'] > 0


def test_cli_batch_mixed_sizes_bucketed(tmp_path):
    """Mixed-size directory with --bucket + --tile: the threaded IO overlap
    path must write every output at the right size (tiled and small-image
    bucket branches both exercised)."""
    import os

    rng = np.random.default_rng(4)
    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(model, str(tmp_path / 'm.npz'))

    src = tmp_path / 'in'
    src.mkdir()
    sizes = [(40, 56), (37, 50), (12, 14)]  # two tiled-bucket sizes + one
    # fully-small image (both dims <= tile) that must hit the
    # upscale_padded small-image bucket branch
    for i, (h, w) in enumerate(sizes):
        _save_png(str(src / f'{i}.png'), (rng.random((h, w, 3)) * 255).astype('uint8'))
    dst = tmp_path / 'out'
    assert upscale_main([str(tmp_path / 'm.npz'), str(src), str(dst),
                         '--tile', '16', '--halo', '4', '--bucket']) == 0
    from PIL import Image

    for i, (h, w) in enumerate(sizes):
        out = Image.open(dst / f'{i}.png')
        assert out.size == (w * 2, h * 2), (i, out.size)


def test_cache_preserves_serving_hints(tmp_path):
    """All three loader-set serving hints survive the .npz round-trip —
    the cache path exists FOR serving."""
    from resselt_tpu.cache import load_model

    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    model.tile_batch = {'f32': 2, 'bf16': 4}
    model.serving_tile = {'f32': 192, 'bf16': 128}
    model.serving_halo = 8
    save_model(model, str(tmp_path / 'h.npz'))
    back = load_model(str(tmp_path / 'h.npz'))
    assert back.tile_batch == {'f32': 2, 'bf16': 4}
    assert back.serving_tile == {'f32': 192, 'bf16': 128}
    assert back.serving_halo == 8
