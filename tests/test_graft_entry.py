"""Guard tests for the driver entry points (__graft_entry__.py)."""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


class TestEntry:
    def test_entry_traces(self):
        fn, args = ge.entry()
        # abstract trace only — proves jittability without burning CPU time
        out = jax.eval_shape(fn, *args)
        assert "ph_foc" in out
        assert out["ph_foc"].shape == (8, 1, 128, 128)

    def test_dryrun_multichip_two_devices(self):
        ge.dryrun_multichip(2)
