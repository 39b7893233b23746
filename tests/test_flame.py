"""Flame-window super-Gaussian fit."""

import numpy as np

from fava_tpu.ops.flame import XFACT, flame_window, super_gaussian


def test_recovers_known_centroid():
    # Build a synthetic transverse-stress profile that IS a super-Gaussian.
    radius = np.linspace(0.0, 2.0e6, 257)  # cm-scale like rtflame
    ccx = 0.5 * (radius[1:] + radius[:-1])
    x0_km = 7.3  # in the fit's XFACT-scaled units
    amp = 4.0e12
    sigma = 3.0
    prof = super_gaussian(ccx / XFACT, amp, x0_km, sigma)
    stress = {"Ryy": 0.5 * prof, "Rzz": 0.5 * prof, "Rxx": prof}

    centroid = flame_window(ccx, stress)
    # The reference fit returns x0 relative to the masked window start
    # (rmin subtracted), scaled back by XFACT.
    rmin_km = ccx[0] / XFACT
    np.testing.assert_allclose(centroid, (x0_km - rmin_km) * XFACT, rtol=1e-6)


def test_mask_applies():
    radius = np.linspace(0.0, 2.0e6, 129)
    ccx = 0.5 * (radius[1:] + radius[:-1])
    prof = super_gaussian(ccx / XFACT, 1.0e10, 9.0, 2.5)
    stress = {"Ryy": prof, "Rzz": prof}
    mask = np.arange(16, 120)
    centroid = flame_window(ccx, stress, mask)
    assert np.isfinite(centroid)
