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


def test_calibrated_per_iter_deadline_returns_best_estimate():
    """A tunnel stall must degrade calibration, not hang it: once the next
    run's predicted finish would pass the deadline, the best estimate so
    far is returned without issuing the run (VERDICT-r4 #1)."""
    import time

    from resselt_tpu.benchmark import calibrated_per_iter

    calls = []

    def run(n):
        calls.append(n)
        return 0.05 * n + 0.2  # 50 ms/iter behind 200 ms fixed latency

    # generous deadline: normal two-run calibration completes
    per = calibrated_per_iter(run, 2, min_seconds=0.3,
                             deadline=time.perf_counter() + 1e9)
    assert abs(per - 0.05) < 1e-9

    # expired deadline: returns the latency-inflated first-run estimate
    # immediately instead of scheduling a second run
    calls.clear()
    stages = []
    per = calibrated_per_iter(run, 2, min_seconds=0.3,
                             deadline=time.perf_counter() - 1.0,
                             progress=lambda s, e: stages.append(s))
    assert calls == [2]          # only the first run happened
    assert per == (0.05 * 2 + 0.2) / 2
    assert stages == ['run1']    # progress streamed for best-so-far reporting


def test_tpu_health_check_reports_ok_on_cpu():
    """The health probe runs its child under the caller's env; forcing the
    CPU backend proves the plumbing without touching the tunnel."""
    health = _load_tool('tpu_health')
    # sitecustomize force-registers the axon TPU plugin, which overrides
    # $JAX_PLATFORMS — the probe child honors RESSELT_HEALTH_PLATFORM via
    # jax.config for exactly this situation
    h = health.check(timeout_s=120.0, env={'RESSELT_HEALTH_PLATFORM': 'cpu'})
    assert h.get('ok'), h
    assert h['platform'] == 'cpu'
    assert h['rtt_s'] >= 0.0


def test_tpu_health_check_times_out_cleanly():
    """A wedged worker yields a diagnostic dict, never a hang/raise."""
    health = _load_tool('tpu_health')
    # an unknown platform makes the child fail fast -> 'crash' verdict
    h = health.check(timeout_s=30.0, env={'RESSELT_HEALTH_PLATFORM': 'definitely-not-a-backend'})
    assert not h.get('ok')
    assert h['reason'] in ('timeout', 'crash')
