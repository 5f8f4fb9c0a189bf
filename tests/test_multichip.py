"""Multi-chip sharding dry run on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as G
    G.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import __graft_entry__ as G
    G.dryrun_multichip(2)


def test_entry_compiles():
    import __graft_entry__ as G
    fn, args = G.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
