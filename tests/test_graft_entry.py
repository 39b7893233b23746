"""Driver entry points: single-chip compile check + multi-chip dryrun."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    out = jax.tree_util.tree_map(np.asarray, out)
    assert np.isfinite(out["spectra_total"][1:]).all()
    assert out["reynolds_stress"].shape[0] == 6
    assert out["favre_rms"].shape[0] == 3
    assert (out["favre_rms"] >= 0).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
