"""Checkpoint crash-safety: atomic writes, pruning, corrupt-latest
fallback."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from exposure_tpu.core.checkpoint import (
    latest_checkpoint_step,
    restore_checkpoint,
    save_checkpoint,
)


def make_state(v):
    return {'w': jnp.full((4,), float(v)), 'step': jnp.int32(v)}


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, make_state(3), 3)
    restored, step = restore_checkpoint(d, make_state(0))
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored['w']), 3.0)


def test_keep_pruning(tmp_path):
    d = str(tmp_path)
    for s in (1, 2, 3):
        save_checkpoint(d, make_state(s), s, keep=2)
    files = sorted(os.listdir(d))
    assert files == ['model.ckpt-2.msgpack', 'model.ckpt-3.msgpack']
    assert latest_checkpoint_step(d) == 3


def test_corrupt_latest_falls_back(tmp_path, capsys):
    d = str(tmp_path)
    save_checkpoint(d, make_state(5), 5, keep=3)
    # simulate a kill mid-write of a newer checkpoint
    with open(os.path.join(d, 'model.ckpt-10.msgpack'), 'wb') as f:
        f.write(b'')
    restored, step = restore_checkpoint(d, make_state(0))
    assert step == 5
    np.testing.assert_array_equal(np.asarray(restored['w']), 5.0)


def test_no_tmp_left_behind(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, make_state(1), 1)
    assert not [p for p in os.listdir(d) if p.endswith('.tmp')]


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / 'nope'), make_state(0))


def test_restore_returns_device_committed_arrays(tmp_path):
    # from_bytes yields host numpy; if restore returned that, EVERY
    # jitted call would re-upload the params (through the remote
    # tunnel this taxed serving 6.6x before being caught on-device) —
    # the restored tree must be jax Arrays committed to a device
    import jax
    d = str(tmp_path)
    save_checkpoint(d, make_state(3), 1)
    restored, _ = restore_checkpoint(d, make_state(0))
    for leaf in jax.tree_util.tree_leaves(restored):
        assert isinstance(leaf, jax.Array), type(leaf)
