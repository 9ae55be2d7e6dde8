"""Checkpoint-reader robustness: corrupted/truncated files must raise a
clean exception (never hang, crash the process, or return silently-wrong
tensors).  The safe readers are a security surface (io/torch_pickle.py's
restricted unpickler + bounds-checked views), so this fuzzes the three
wire formats with deterministic truncations and byte flips."""

import io
import zipfile

import numpy as np
import pytest
import torch

from resselt_tpu.io import load_state_dict_from_file


def _make_zip_pth(path):
    torch.save({'w': torch.randn(4, 3), 'b': torch.randn(4)}, str(path))


def _make_legacy_pth(path):
    torch.save({'w': torch.randn(4, 3)}, str(path), _use_new_zipfile_serialization=False)


def _make_safetensors(path):
    import safetensors.torch

    safetensors.torch.save_file({'w': torch.randn(4, 3)}, str(path))


MAKERS = {'zip.pth': _make_zip_pth, 'legacy.pth': _make_legacy_pth, 's.safetensors': _make_safetensors}


@pytest.mark.parametrize('fname', list(MAKERS))
@pytest.mark.parametrize('frac', [0.05, 0.3, 0.6, 0.9, 0.99])
def test_truncated_checkpoint_raises(tmp_path, fname, frac):
    p = tmp_path / fname
    MAKERS[fname](p)
    data = p.read_bytes()
    cut = tmp_path / ('cut_' + fname)
    cut.write_bytes(data[: max(1, int(len(data) * frac))])
    with pytest.raises(Exception):
        load_state_dict_from_file(str(cut))


@pytest.mark.parametrize('fname', list(MAKERS))
@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_corrupted_checkpoint_never_crashes(tmp_path, fname, seed):
    """Flip a burst of bytes at a random position: must either raise or
    return a plain dict of ndarrays (zip CRCs may still pass on the
    untouched members) — anything but a hang/abort."""
    p = tmp_path / fname
    MAKERS[fname](p)
    data = bytearray(p.read_bytes())
    rng = np.random.default_rng(seed)
    pos = int(rng.integers(0, max(1, len(data) - 16)))
    for i in range(16):
        data[pos + i] ^= 0xFF
    bad = tmp_path / ('bad_' + fname)
    bad.write_bytes(bytes(data))
    try:
        out = load_state_dict_from_file(str(bad))
    except Exception:
        return
    assert isinstance(out, dict)
    for v in out.values():
        assert isinstance(v, np.ndarray)


def test_pkl_zip_bomb_like_member_rejected(tmp_path):
    """A data.pkl that isn't a pickle at all must raise, not loop."""
    p = tmp_path / 'junk.pth'
    with zipfile.ZipFile(p, 'w') as zf:
        zf.writestr('archive/data.pkl', b'\xff' * 1024)
        zf.writestr('archive/data/0', b'\x00' * 16)
    with pytest.raises(Exception):
        load_state_dict_from_file(str(p))


def test_recursive_memo_pickle_terminates(tmp_path):
    """Self-referential containers must not hang the reader."""
    import pickle

    x = []
    x.append(x)
    buf = io.BytesIO()
    pickle.dump({'w': x}, buf)
    p = tmp_path / 'rec.pth'
    with zipfile.ZipFile(p, 'w') as zf:
        zf.writestr('archive/data.pkl', buf.getvalue())
    try:
        load_state_dict_from_file(str(p))
    except Exception:
        pass  # raising is fine; hanging is the failure mode
