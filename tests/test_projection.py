"""Projection maps: exact equality with the regrid-then-sum oracle
(line integrals of piecewise-constant AMR data commute with the
piecewise-constant regrid) and conservation of the volume integral."""

import jax.numpy as jnp
import numpy as np
import pytest

from fava_tpu.ops import projection as proj_ops
from fava_tpu.ops import regrid as regrid_ops
from tests.oracles.regrid import from_amr_oracle


def test_uniform_projection_matches_numpy():
    rng = np.random.default_rng(21)
    f = rng.random((8, 12, 16))
    deltas = (0.5, 0.25, 0.125)
    for axis in range(3):
        got = proj_ops.project_uniform(jnp.asarray(f), deltas, axis=axis)
        np.testing.assert_allclose(got, f.sum(axis=axis) * deltas[axis], rtol=1e-12)
    w = rng.random((8, 12, 16))
    got = proj_ops.project_uniform(jnp.asarray(f), deltas, axis=1, weight=jnp.asarray(w))
    np.testing.assert_allclose(got, (f * w).sum(axis=1) / w.sum(axis=1), rtol=1e-12)


def test_uniform_projection_validation():
    with pytest.raises(ValueError, match="2D or 3D"):
        proj_ops.project_uniform(jnp.zeros(4), (1.0,))
    with pytest.raises(ValueError, match="axis"):
        proj_ops.project_uniform(jnp.zeros((4, 4, 4)), (1.0, 1.0, 1.0), axis=3)
    # 2D volumes project to 1D column profiles
    f2 = np.arange(12.0).reshape(3, 4)
    got = proj_ops.project_uniform(jnp.asarray(f2), (0.5, 0.25), axis=1)
    np.testing.assert_allclose(got, f2.sum(axis=1) * 0.25, rtol=1e-12)


@pytest.fixture(scope="module")
def amr_mesh(tmp_path_factory):
    from fava_tpu.io import synthetic
    from fava_tpu.mesh import FLASH as FlashAMR

    path = tmp_path_factory.mktemp("proj") / "rt_hdf5_plt_cnt_0001"
    synthetic.make_amr_file(
        path, ncells=(8, 8, 8), nblks=(2, 2, 2), refine={0: 2, 3: 3}
    )
    mesh = FlashAMR(path)
    mesh.load()
    mesh.load_data(["dens", "velx"])
    return mesh


def _regrid_oracle(mesh, fields):
    data = {k: np.asarray(mesh.host_data(k), dtype=np.float64) for k in fields}
    expected, _ = from_amr_oracle(
        data,
        block_bounds=np.asarray(mesh.block_bounds),
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level).astype(int),
        ncells=mesh.nCellsVec,
        nblks=mesh.nBlksVec,
        ndim=3,
        fields=fields,
    )
    return expected


def test_amr_projection_equals_regrid_then_sum(amr_mesh):
    mesh = amr_mesh
    expected = _regrid_oracle(mesh, ["dens"])["dens"]
    plan = regrid_ops.RegridPlan(
        block_bounds=np.asarray(mesh.block_bounds),
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level),
        ncells_vec=mesh.nCellsVec,
        nblks_vec=mesh.nBlksVec,
        ndim=3,
    )
    for axis in range(3):
        maps, coords = proj_ops.project_amr(
            plan, {"dens": mesh._field_stack("dens")}, axis=axis
        )
        dx = float(plan.grid_delta[axis])
        np.testing.assert_allclose(maps["dens"], expected.sum(axis=axis) * dx, rtol=1e-12)
        keep = [a for a in range(3) if a != axis]
        assert coords[0].size == expected.shape[keep[0]]
        assert coords[1].size == expected.shape[keep[1]]


def test_amr_weighted_projection(amr_mesh):
    mesh = amr_mesh
    exp = _regrid_oracle(mesh, ["dens", "velx"])
    plan = regrid_ops.RegridPlan(
        block_bounds=np.asarray(mesh.block_bounds),
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level),
        ncells_vec=mesh.nCellsVec,
        nblks_vec=mesh.nBlksVec,
        ndim=3,
    )
    maps, _ = proj_ops.project_amr(
        plan,
        {"velx": mesh._field_stack("velx")},
        axis=0,
        weight=mesh._field_stack("dens"),
    )
    ref = (exp["velx"] * exp["dens"]).sum(axis=0) / exp["dens"].sum(axis=0)
    np.testing.assert_allclose(maps["velx"], ref, rtol=1e-12)
    # weight == field (density-weighted density: the clumping map)
    got = mesh.projection(field="dens", axis=0, weight="dens")
    ref_sq = (exp["dens"] ** 2).sum(axis=0) / exp["dens"].sum(axis=0)
    np.testing.assert_allclose(got["map"], ref_sq, rtol=1e-12)


def test_projection_conserves_mass(amr_mesh):
    mesh = amr_mesh
    out = mesh.projection(field="dens", axis=0)
    d1 = out["coord1"][1] - out["coord1"][0]
    d2 = out["coord2"][1] - out["coord2"][0]
    total = out["map"].sum() * d1 * d2
    np.testing.assert_allclose(total, mesh.mass_sum()["total"], rtol=1e-9)


def test_amr_projection_sharded_inputs_match(amr_file, eight_device_mesh):
    """Under an active device mesh the AMR block stacks arrive sharded;
    the per-level gather/scatter must partition without changing the
    numbers."""
    from fava_tpu.mesh import FLASH as FlashAMR
    from fava_tpu.parallel import use_mesh

    mesh0 = FlashAMR(amr_file)
    mesh0.load()
    mesh0.load_data(["dens"])
    ref = mesh0.projection(field="dens", axis=0)

    with use_mesh(eight_device_mesh):
        mesh1 = FlashAMR(amr_file)
        mesh1.load()
        mesh1.load_data(["dens"])
        got = mesh1.projection(field="dens", axis=0)

    np.testing.assert_allclose(got["map"], ref["map"], rtol=1e-12)


def test_mesh_wrappers_and_registration(uniform_file, amr_mesh):
    import fava_tpu
    from fava_tpu.mesh import FlashUniform

    out = amr_mesh.projection(field="dens", axis=1, weight="velx")
    assert out["map"].shape == (
        amr_mesh.projection(field="dens", axis=1)["map"].shape
    )

    mesh = FlashUniform(uniform_file)
    mesh.load()
    got = mesh.projection(field="dens", axis=2)
    dens = np.asarray(mesh.data("dens"), dtype=np.float64)
    dx = mesh._domain_lengths()[2] / dens.shape[2]
    np.testing.assert_allclose(got["map"], dens.sum(axis=2) * dx, rtol=1e-9)

    m = fava_tpu.FLASH(uniform_file.parent)
    m.load(file_type="uni")
    assert hasattr(m, "projection")
    assert m.projection(field="dens")["map"].ndim == 2
    with pytest.raises(ValueError, match="subdomain"):
        plan = regrid_ops.RegridPlan(
            block_bounds=np.asarray(amr_mesh.block_bounds),
            node_type=np.asarray(amr_mesh.node_type),
            refine_level=np.asarray(amr_mesh.refine_level),
            ncells_vec=amr_mesh.nCellsVec,
            nblks_vec=amr_mesh.nBlksVec,
            ndim=3,
            subdomain_coords=np.asarray([[0.1, 0.9]] * 3),
        )
        proj_ops.project_amr(plan, {"dens": amr_mesh._field_stack("dens")})
