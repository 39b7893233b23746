"""Tile-DMA Pallas regrid kernel (interpreter mode) vs the gather path."""

import numpy as np
import pytest

from fava_tpu.ops import pallas_kernels as pk
from fava_tpu.ops import pallas_regrid, regrid as regrid_ops
from tests.oracles.regrid import from_amr_oracle


@pytest.fixture()
def force_interpret():
    pk.FORCE_INTERPRET = True
    yield
    pk.FORCE_INTERPRET = False


def _amr_case(tmp_path, refine, ncells=(8, 8, 8), nblks=(2, 2, 2)):
    from fava_tpu.io import synthetic
    from fava_tpu.mesh import FLASH as FlashAMR

    path = tmp_path / "rt_hdf5_plt_cnt_0001"
    synthetic.make_amr_file(path, ncells=ncells, nblks=nblks, refine=refine)
    mesh = FlashAMR(path)
    mesh.load()
    mesh.load_data(["dens", "velx"])
    return mesh


def _plan(mesh, **kwargs):
    return regrid_ops.RegridPlan(
        block_bounds=mesh.block_bounds,
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level),
        ncells_vec=mesh.nCellsVec,
        nblks_vec=mesh.nBlksVec,
        ndim=3,
        **kwargs,
    )


def test_supported_predicate():
    assert not pallas_regrid.regrid_tiles_supported((16, 16, 16), 4)  # CPU, no interpret
    pk.FORCE_INTERPRET = True
    try:
        assert pallas_regrid.regrid_tiles_supported((16, 16, 16), 16)
        assert not pallas_regrid.regrid_tiles_supported((16, 16, 16), 32)  # scale too big
        assert not pallas_regrid.regrid_tiles_supported((16, 12, 16), 2)  # not pow2
        assert not pallas_regrid.regrid_tiles_supported((4, 16, 16), 2)  # ncx too small
        assert not pallas_regrid.regrid_tiles_supported((16, 8, 8), 2)  # lane < 128
    finally:
        pk.FORCE_INTERPRET = False


def test_tile_regrid_matches_gather_full_domain(tmp_path, force_interpret):
    mesh = _amr_case(tmp_path, refine={0: 2, 5: 3})
    plan = _plan(mesh)
    data = {k: mesh._data[k] for k in ("dens", "velx")}

    got = pallas_regrid.regrid_fields_pallas(plan, data, ["dens", "velx"])

    expected, total = from_amr_oracle(
        {k: np.asarray(v) for k, v in data.items()},
        block_bounds=np.asarray(mesh.block_bounds),
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level).astype(int),
        ncells=mesh.nCellsVec,
        nblks=mesh.nBlksVec,
        fields=["dens", "velx"],
    )
    for key in ("dens", "velx"):
        np.testing.assert_allclose(np.asarray(got[key]), expected[key], rtol=1e-12, err_msg=key)


def test_tile_regrid_matches_gather_subdomain(tmp_path, force_interpret):
    mesh = _amr_case(tmp_path, refine={0: 2, 5: 3})
    sub = np.array([[0.3, 0.8], [0.25, 0.75], [0.2, 0.7]])
    plan = _plan(mesh, subdomain_coords=sub)
    data = {k: mesh._data[k] for k in ("dens", "velx")}

    got = pallas_regrid.regrid_fields_pallas(plan, data, ["dens"])

    expected, total = from_amr_oracle(
        {k: np.asarray(v) for k, v in data.items()},
        block_bounds=np.asarray(mesh.block_bounds),
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level).astype(int),
        ncells=mesh.nCellsVec,
        nblks=mesh.nBlksVec,
        subdomain_coords=sub,
        fields=["dens"],
    )
    assert got["dens"].shape == tuple(total)
    np.testing.assert_allclose(np.asarray(got["dens"]), expected["dens"], rtol=1e-12)


def test_tile_regrid_refine_truncation(tmp_path, force_interpret):
    mesh = _amr_case(tmp_path, refine={1: 3})
    plan = _plan(mesh, refine_to=2)
    data = {k: mesh._data[k] for k in ("dens",)}
    got = pallas_regrid.regrid_fields_pallas(plan, data, ["dens"])

    expected, total = from_amr_oracle(
        {"dens": np.asarray(data["dens"])},
        block_bounds=np.asarray(mesh.block_bounds),
        node_type=np.asarray(mesh.node_type),
        refine_level=np.asarray(mesh.refine_level).astype(int),
        ncells=mesh.nCellsVec,
        nblks=mesh.nBlksVec,
        refine_to=2,
        fields=["dens"],
    )
    np.testing.assert_allclose(np.asarray(got["dens"]), expected["dens"], rtol=1e-12)
