"""Driver entry points compile and run (CPU, 8 virtual devices)."""

import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape[0] == 1


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
