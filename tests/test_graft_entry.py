"""The driver entry points must trace — in the fast tier.

Round 3's breakage shipped because the cheapest driver probe (entry())
did not cover the lane path; entry() now traces BOTH production
programs, and this test makes that probe part of the fast tier so a
trace-time failure of either program fails CI in minutes, not at the
driver's bench step.
"""
import jax


def test_entry_traces_both_paths():
    import __graft_entry__ as g

    fn, args = g.entry()
    jax.jit(fn).trace(*args)        # generic vmapped solve + lane solver


def test_dryrun_multichip_smoke():
    """The 8-device mesh dryrun (shard_map generic + sharded lane path)
    runs on the conftest's emulated CPU mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
