"""Torch-side oracle helpers for parity tests.

The reference package at /root/reference is importable (pure torch) and is
used ONLY as a test oracle: build a reference model with random weights,
export its state dict, and compare forward outputs against our JAX
implementation loaded from that same state dict.
"""

from __future__ import annotations

import sys

import numpy as np
import torch

REFERENCE_PATH = '/root/reference'
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

torch.manual_seed(0)
torch.set_grad_enabled(False)


def state_dict_to_numpy(sd) -> dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


_orig_torch_tensor = torch.tensor
_orig_torch_sort = torch.sort


def _tensor_no_pin(*args, **kwargs):
    # the reference's DySample passes pin_memory=True, which raises on
    # CPU-only torch (resselt/utilities/dysample.py:62); strip it.
    kwargs.pop('pin_memory', None)
    return _orig_torch_tensor(*args, **kwargs)


def _sort_stable(*args, **kwargs):
    # ATD's AC_MSA sorts category ids with stable=False
    # (resselt/archs/atd/arch.py:303) — the tie order among equal category
    # ids is implementation-defined and not reproducible across backends
    # (the reference itself is not bit-stable). Pin the oracle to stable
    # order, which is what the JAX implementation uses.
    kwargs['stable'] = True
    return _orig_torch_sort(*args, **kwargs)


def run_torch(model, x_nhwc: np.ndarray, *args) -> np.ndarray:
    """Run a torch NCHW model on an NHWC numpy batch, return NHWC numpy."""
    model = model.eval()
    t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    torch.tensor = _tensor_no_pin
    torch.sort = _sort_stable
    try:
        with torch.inference_mode():
            y = model(t, *args)
    finally:
        torch.tensor = _orig_torch_tensor
        torch.sort = _orig_torch_sort
    return y.detach().cpu().numpy().transpose(0, 2, 3, 1)


def init_random(model: torch.nn.Module, seed: int = 0) -> torch.nn.Module:
    """Re-randomize all parameters with a fixed seed so state dicts aren't
    degenerate (default-initialized zeros hide bugs)."""
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def max_err(a: np.ndarray, b: np.ndarray) -> float:
    assert a.shape == b.shape, f'shape mismatch: {a.shape} vs {b.shape}'
    return float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
