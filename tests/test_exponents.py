"""Structure-function scaling exponents (plain and ESS fits).

The pinning property: on synthetic S_p(r) = g(r)^zeta_p with a
NON-power-law common factor g, the plain log-r fit is biased while the
ESS fit recovers zeta_p / zeta_ref exactly — the reason ESS exists
(Benzi et al. 1993).
"""

import numpy as np
import pytest

from fava_tpu.ops import structure as structure_ops


def _synthetic_vsfs(zetas, seps, g=None):
    g = seps if g is None else g
    vsfs = {"separations": np.asarray(seps, float), "longitudinal": {}, "transverse": {}}
    for o, z in zetas.items():
        vsfs["longitudinal"][str(o)] = np.asarray(g, float) ** z
        vsfs["transverse"][str(o)] = 2.0 * np.asarray(g, float) ** (0.9 * z)
    return vsfs


def test_plain_fit_recovers_power_law_exponents():
    seps = np.geomspace(0.01, 0.5, 32)
    zetas = {o: o / 3.0 for o in range(1, 11)}
    out = structure_ops.scaling_exponents(_synthetic_vsfs(zetas, seps), ess=False)
    np.testing.assert_allclose(out["longitudinal"]["zeta"], [o / 3 for o in range(1, 11)], rtol=1e-10)
    np.testing.assert_allclose(out["transverse"]["zeta"], [0.3 * o for o in range(1, 11)], rtol=1e-10)
    assert out["ess"] is False and out["reference_order"] is None
    assert np.all(out["longitudinal"]["zeta_err"] < 1e-10)


def test_ess_cancels_non_power_law_prefactor():
    seps = np.geomspace(0.01, 0.5, 32)
    # g(r): power law contaminated by a large-scale rolloff -- NOT a
    # power law in r, so the direct fit must be biased.
    g = seps * np.exp(-2.0 * seps) * (1.0 + 0.5 * seps**0.5)
    zetas = structure_ops.she_leveque(range(1, 11))
    vsfs = _synthetic_vsfs(dict(zip(range(1, 11), zetas)), seps, g=g)
    ess = structure_ops.scaling_exponents(vsfs, reference_order=3, ess=True)
    plain = structure_ops.scaling_exponents(vsfs, ess=False)
    # ESS: exact (zeta_3(SL) = 1, so normalization is the identity).
    np.testing.assert_allclose(ess["longitudinal"]["zeta"], zetas, rtol=1e-9)
    # Plain fit: visibly biased on the high orders.
    assert abs(plain["longitudinal"]["zeta"][9] - zetas[9]) > 0.05


def test_she_leveque_benchmarks():
    z = structure_ops.she_leveque([3, 6, 9])
    np.testing.assert_allclose(z[0], 1.0, rtol=1e-12)  # zeta_3 == 1 exactly
    assert z[1] < 2.0 and z[2] < 3.0  # concave (intermittent) vs K41


def test_fit_range_and_validation():
    seps = np.geomspace(0.01, 0.5, 32)
    zetas = {o: o / 3.0 for o in range(1, 11)}
    vsfs = _synthetic_vsfs(zetas, seps)
    out = structure_ops.scaling_exponents(vsfs, ess=False, fit_range=(0.02, 0.2))
    np.testing.assert_allclose(out["longitudinal"]["zeta"][2], 1.0, rtol=1e-9)
    with pytest.raises(ValueError, match="fit_range"):
        structure_ops.scaling_exponents(vsfs, fit_range=(0.3, 0.30001))
    with pytest.raises(ValueError, match="reference_order"):
        structure_ops.scaling_exponents(vsfs, reference_order=42)


def test_nonpositive_samples_are_excluded():
    seps = np.geomspace(0.01, 0.5, 16)
    zetas = {o: o / 3.0 for o in range(1, 11)}
    vsfs = _synthetic_vsfs(zetas, seps)
    vsfs["longitudinal"]["2"] = vsfs["longitudinal"]["2"].copy()
    vsfs["longitudinal"]["2"][:3] = 0.0  # unfittable samples
    out = structure_ops.scaling_exponents(vsfs, ess=False)
    np.testing.assert_allclose(out["longitudinal"]["zeta"][1], 2.0 / 3.0, rtol=1e-9)


def test_mesh_method_and_registration(uniform_file):
    import fava_tpu
    from fava_tpu.mesh import FlashUniform

    mesh = FlashUniform(uniform_file)
    mesh.load()
    vsfs = mesh.structure_functions(num_seps=8, num_points=256, sep_bounds=(0.05, 0.4))
    out = mesh.structure_function_exponents(vsfs=vsfs)
    out2 = structure_ops.scaling_exponents(vsfs)
    np.testing.assert_allclose(out["longitudinal"]["zeta"], out2["longitudinal"]["zeta"])

    # Computes its own structure functions when none are passed.
    out3 = mesh.structure_function_exponents(
        num_seps=8, num_points=256, sep_bounds=(0.05, 0.4)
    )
    np.testing.assert_allclose(out3["longitudinal"]["zeta"], out["longitudinal"]["zeta"])

    m = fava_tpu.FLASH(uniform_file.parent)
    m.load(file_type="uni")
    assert hasattr(m, "structure_function_exponents")
    got = m.structure_function_exponents(num_seps=8, num_points=256, sep_bounds=(0.05, 0.4))
    np.testing.assert_allclose(got["orders"], np.arange(1.0, 11.0))
