"""Driver entry-point tests: entry() compiles + runs; dryrun_multichip works
on the 8-device CPU fake."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    d, ext = jax.jit(fn)(*args)
    assert d.shape == (8, 8) and ext.shape == (8, 8)
    # self-queries (queries are random, but results must be valid ids)
    assert (np.asarray(ext) >= -1).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally
