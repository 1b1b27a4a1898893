"""Driver entry-point smoke tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == ge.A
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
