"""The driver contract: entry() compile-checks single-chip;
dryrun_multichip(8) runs the sharded training step on the virtual mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    img, states, ids = jax.block_until_ready(out)
    assert img.shape[1:] == (64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert (np.asarray(ids) >= 0).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
