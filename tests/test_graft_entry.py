"""Driver entry points: single-chip jittable forward + multichip dryrun
with DP+TP shardings on the virtual CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import pytest

import __graft_entry__ as g


def test_entry_eval_shape():
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 128, 128, 1)


@pytest.mark.parametrize("n", [8, 2, 1])
def test_dryrun_multichip(n):
    g.dryrun_multichip(n)
