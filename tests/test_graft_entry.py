"""Driver entry points: compile-check entry() and run the multichip
dryrun on the virtual device mesh."""
import sys

import jax
import pytest


sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    shapes = [o.shape for o in out]
    assert shapes[0][0] == 3  # three example sentences


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
