"""Driver contract: entry() compiles single-chip; dryrun_multichip runs a
full sharded step on the 8-device virtual CPU mesh."""

import pytest

import jax

import __graft_entry__ as ge

pytestmark = pytest.mark.slow  # integration tier (full suite: pytest -m '')


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.fluid["Position"])
    assert float(out.time) > 0.0
    assert not bool(out.overflow)


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
