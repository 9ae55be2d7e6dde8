"""Opt-in int8 quantized serving — MEASURED NOT BENEFICIAL on v5e for
the standard SR families; kept as a working, tested capability.

The v5e MXU runs s8 x s8 -> s32 at ~2x the bf16 rate through plain XLA
*at >= 128 channels* (376.8 TOP/s matmul / 341.5 TOP/s on a 128ch 3x3
conv, ``tools/probe_int8.py``).  SR conv stacks live at 48-64 channels,
where lane padding already makes XLA's bf16 conv run at the padded-MXU
roofline — int8 on the same padded footprint gains NOTHING even with
static scales and an int8-resident chain (``tools/probe_int8_static.py``:
16.3 vs 16.4 ms for an 8-conv 64ch chain), and the dynamic activation
amax adds a full extra pass per conv.  Whole-model (``bench_int8.md``):
compact 1.04x, rcan 0.97x, plksr 0.81x, esrgan 0.67x, span 0.47x.

Use only for custom models with wide (>=128ch) plain-conv bodies:

    model = resselt_tpu.load_from_file('4x.safetensors').quantize_int8()

Scheme: per-output-channel symmetric int8 weights, dynamic per-tensor
activation quant, int32 accumulate, f32 rescale.  Eligibility: plain
(groups == 1) convs with cin >= 32 and cout >= 32 — head/tail and
depthwise/grouped convs stay in full precision — AND consumption through
an int8-aware op, proven by ``SRModel.quantize_int8``'s eval_shape
discovery trace (``nn.params._INT8_DISCOVERY``): weights reaching
transposed convs or raw ``F.conv2d`` calls stay float.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

#: minimum cin/cout for a conv weight to be quantized
MIN_CH = 32


def eligible(key: str, arr: np.ndarray, min_ch: int = MIN_CH) -> bool:
    """Quantize only plain-conv-shaped weights wide enough to matter.

    ``arr.shape[1]`` is cin-per-group, so depthwise (1) and small-group
    (2) convs are naturally excluded; 3-channel head convs and <=31-ch
    tail projections are excluded by the same bound."""
    return (
        key.endswith('.weight')
        and arr.ndim == 4
        and arr.shape[0] >= min_ch
        and arr.shape[1] >= min_ch
    )


def quantize_weight(arr: np.ndarray):
    """Per-output-channel symmetric int8: returns (w_int8, scale_f32[O])."""
    a = np.asarray(arr, np.float64)
    s = np.max(np.abs(a), axis=(1, 2, 3)) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(a / s[:, None, None, None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def quantize_params(params: Mapping[str, np.ndarray], min_ch: int = MIN_CH,
                    allowed: set | None = None):
    """Return (new param dict, #convs quantized).

    Every eligible ``<name>.weight`` becomes int8 with a sibling
    ``<name>.weight_scale``; everything else is passed through.  The nn
    layer dispatches on the weight dtype (``PTree.conv`` ->
    ``F.conv2d_int8``).

    ``allowed``: keys proven int8-safe by consumption discovery
    (``SRModel.quantize_int8`` traces apply and records which weights flow
    through an int8-aware op); shape eligibility alone would also quantize
    weights consumed by transposed convs or raw ``F.conv2d`` calls, which
    have no int8 path."""
    out = {}
    n = 0
    for k, v in params.items():
        arr = np.asarray(v)
        if (allowed is None or k in allowed) and eligible(k, arr, min_ch):
            q, s = quantize_weight(arr)
            out[k] = q
            out[k + '_scale'] = s
            n += 1
        else:
            out[k] = arr
    return out, n
