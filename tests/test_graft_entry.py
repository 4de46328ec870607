"""Driver-contract checks: entry() compiles, dryrun_multichip(8) executes."""

import os

import jax
import numpy as np

# repo root on sys.path: tests/conftest.py bootstraps it for the session


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry
    fn, args = entry()
    fake, score = jax.jit(fn)(*args)
    assert fake.shape == (4, 2048, 102)
    assert score.shape == (4, 1)
    assert np.isfinite(np.asarray(jax.device_get(score))).all()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
