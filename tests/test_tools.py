"""Smoke tests for user-facing tools (serving auto-tuner)."""

import importlib.util
import os

import resselt_tpu
from resselt_tpu.cache import save_model
from resselt_tpu.zoo import make_compact

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, 'tools', f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tune_serving_smoke(tmp_path, capsys):
    tune = _load_tool('tune_serving')
    model = resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))
    save_model(model, str(tmp_path / 'm.npz'))
    rc = tune.main([str(tmp_path / 'm.npz'), '--tiles', '16,32', '--batches', '1',
                    '--dtypes', 'f32', '--budget-s', '0.5'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'best: tile' in out and '--tile' in out
