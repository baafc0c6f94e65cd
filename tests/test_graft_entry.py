"""The driver entry points: single-chip jittable forward + multichip dryrun."""

import sys

import jax

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 1, 40, 40)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
