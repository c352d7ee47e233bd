"""Driver interface: entry() compiles and runs; dryrun_multichip exercises
the worlds x rows mesh on the virtual CPU devices."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert out.pos.shape == args[0].pos.shape


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
