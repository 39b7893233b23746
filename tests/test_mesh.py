"""Mesh classes: sniffing, geometry queries, block bookkeeping."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu.mesh import FLASH as FlashAMR
from fava_tpu.mesh import FlashParticles, FlashUniform, Mesh, Structured, Unstructured


def test_mesh_type_names():
    assert Structured().mesh_type == "Structured"
    assert Unstructured().mesh_type == "Unstructured"
    assert not Mesh.is_this_your_mesh("anything")


def test_file_sniffing():
    assert FlashAMR.is_this_your_mesh("run_hdf5_plt_cnt_0001")
    assert FlashAMR.is_this_your_mesh("run_hdf5_chk_0001")
    assert not FlashAMR.is_this_your_mesh("run_hdf5_uniform_0001")
    assert FlashUniform.is_this_your_mesh("run_hdf5_uniform_0001")
    assert FlashParticles.is_this_your_mesh("run_hdf5_part_0001")


@pytest.fixture()
def amr_mesh(amr_file):
    mesh = FlashAMR(amr_file)
    mesh.load()
    return mesh


def test_amr_metadata(amr_mesh):
    assert amr_mesh.ndim == 3
    assert amr_mesh.nxb == 8
    assert amr_mesh.refine_level_max == 3
    assert amr_mesh.geometry.value == "cartesian"
    np.testing.assert_allclose(amr_mesh.domain_volume, 1.0)

    # Rank-local block range (reference _flash.py:203-208): single host
    # process owns all blocks; decomposition is device-level sharding.
    assert amr_mesh.blk_beg == 0
    assert amr_mesh.blk_end == amr_mesh.nblocks

    leaves = amr_mesh.get_blocklist("LEAF")
    allb = amr_mesh.get_blocklist("ALL")
    assert len(allb) == amr_mesh.nblocks
    assert len(leaves) < len(allb)
    # Leaf volumes tile the domain.
    vols = amr_mesh.get_cell_volumes() * amr_mesh.ncells
    np.testing.assert_allclose(vols.sum(), 1.0)


def test_deltas_and_volumes(amr_mesh):
    lmax = amr_mesh.refine_level_max
    d0 = amr_mesh.get_minimum_deltas(0)
    np.testing.assert_allclose(d0, 1.0 / (8 * 2 * 2 ** (lmax - 1)))
    np.testing.assert_allclose(
        amr_mesh.get_delta_from_refine_level(0, 1), 1.0 / (8 * 2)
    )
    np.testing.assert_allclose(
        amr_mesh.cell_volume_min, amr_mesh.get_cell_volume_from_refinement(lmax)
    )
    assert amr_mesh.cell_volume_max > amr_mesh.cell_volume_min


def test_cell_coords(amr_mesh):
    x = amr_mesh.get_cell_coords(axis=0, blockID=0, edge="CENTER")
    lb, ub = amr_mesh.block_bounds[0, 0]
    dx = (ub - lb) / amr_mesh.nxb
    assert len(x) == amr_mesh.nxb
    np.testing.assert_allclose(x[0], lb + dx / 2)
    np.testing.assert_allclose(x[-1], ub - dx / 2)
    xl = amr_mesh.get_cell_coords(axis=0, blockID=0, edge="LEFT")
    np.testing.assert_allclose(xl[0], lb)


def test_point_location(amr_mesh):
    pts = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9], [0.51, 0.49, 0.5]])
    blk, cells, found = amr_mesh.locate_points(pts)
    assert found.all()
    for p, b in zip(pts, blk):
        assert amr_mesh.is_point_in_block(p, b)
    # get_coord_index agrees with locate_points
    idx, b0 = amr_mesh.get_coord_index(pts[0], amr_mesh.get_blocklist("LEAF"))
    assert b0 == blk[0]
    assert idx == [int(c) for c in cells[0]]


def test_sample_fields_values(amr_mesh):
    pts = np.array([[0.3, 0.4, 0.6]])
    values, vol_frac, found = amr_mesh.sample_fields(pts, ["dens"])
    assert found.all()
    blk, cells, _ = amr_mesh.locate_points(pts)
    direct = amr_mesh.host_data("dens")[blk[0], cells[0, 0], cells[0, 1], cells[0, 2]]
    np.testing.assert_allclose(values["dens"][0], direct)


def test_uniform_mesh_load(uniform_file):
    mesh = FlashUniform(uniform_file)
    mesh.load()
    assert mesh.nblocks == 1
    assert tuple(mesh.nCellsVec) == (16, 16, 16)
    d = mesh.data("dens")
    assert d.shape == (16, 16, 16)
    assert float(np.asarray(d).min()) > 0


def test_particles_load(particle_file):
    p = FlashParticles(particle_file)
    p.load()
    assert p.nParticles == 128
    tags = p.data["tag"]
    assert np.all(np.diff(tags) > 0)  # sorted by tag
    coords = p.get_coords()
    assert coords.shape == (128, 3)
    stats = p.statistics(["velx"])
    assert set(stats["velx"].keys()) == {"mean", "rms", "min", "max"}
    sel = p.select_by_tags(tags[[3, 7]])
    np.testing.assert_allclose(sel["tag"], tags[[3, 7]])


def test_select_by_tags_missing_tag_errors(particle_file):
    p = FlashParticles(particle_file)
    p.load()
    bogus = np.array([int(p.data["tag"].max()) + 7])
    with pytest.raises(ValueError, match="not found"):
        p.select_by_tags(bogus)


def test_particle_long_field_names(particle_file):
    p = FlashParticles(particle_file)
    p._load_particles(fields=["density", "velocity-x", "tag"])
    assert "dens" in p.data and "velx" in p.data


def test_get_coord_index_outside_domain_errors(amr_mesh):
    outside = amr_mesh.domain_bounds[:, 1] + 1.0
    with pytest.raises(ValueError, match="not inside any listed block"):
        amr_mesh.get_coord_index(outside, amr_mesh.get_blocklist("LEAF"))


def test_from_amr_writes_consistent_block_count(amr_file, tmp_path):
    from fava_tpu.mesh.flash_amr import FLASH as FlashAMR
    from fava_tpu.mesh.flash_uniform import FlashUniform

    amr = FlashAMR(amr_file)
    amr.load()
    amr.load_data(["dens"])
    # Mimic files that carry the 'total blocks' spelling.
    amr.scalars["integer"]["total blocks"] = amr.nblocks
    out = tmp_path / "rt_hdf5_uniform_0042"
    amr.from_amr(fields=["dens"], filename=out)
    uni = FlashUniform(out)
    uni.load()
    assert uni.nblocks == 1
    assert uni.scalars["integer"].get("total blocks", 1) == 1


def test_locate_points_includes_domain_max_face(amr_mesh):
    """Points exactly on the domain's max face (linspace endpoint
    sampling) must be found — half-open block ownership applies only
    to interior faces. Interior boundary points keep a unique owner."""
    hi = amr_mesh.domain_bounds[:, 1].astype(np.float64)
    lo = amr_mesh.domain_bounds[:, 0].astype(np.float64)
    pts = np.stack([lo, 0.5 * (lo + hi), hi])
    blk, cells, found = amr_mesh.locate_points(pts)
    assert found.all()
    # the max-face point lands in the last cell of its block
    nvec = amr_mesh.nCellsVec
    for a in range(amr_mesh.ndim):
        assert cells[2, a] == nvec[a] - 1


def test_unloaded_mesh_attributes_raise_attribute_error(tmp_path):
    """_SyncedInt must raise AttributeError (not KeyError) before
    load(): hasattr()/getattr(default) duck-typing must work."""
    m = FlashAMR(tmp_path / "x_hdf5_plt_cnt_0000")
    assert not hasattr(m, "nxb")
    assert getattr(m, "xmax", None) is None
    with pytest.raises(AttributeError, match="unset"):
        _ = m.nxb


def test_particles_filename_setter_retries_after_failure(tmp_path, particle_file):
    """If metadata loading fails (file mid-write), the setter must not
    commit the path: a retry with the same path re-reads it instead of
    silently keeping the previous file's stale metadata."""
    from pathlib import Path

    bad = tmp_path / "x_hdf5_part_0009"
    bad.write_bytes(b"not an hdf5 file")
    p = FlashParticles(particle_file)
    with pytest.raises(Exception):
        p.filename = bad
    assert p.filename == Path(particle_file)

    # finish the "write", retry: must load the new metadata now
    import shutil

    shutil.copyfile(particle_file, bad)
    p.filename = bad
    assert p.filename == bad
    p.load()
    assert "tag" in p.data


def test_flagship_analysis_requires_3d(tmp_path):
    from fava_tpu.io.synthetic import make_uniform_file

    make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 1), ndim=2)
    uni = FlashUniform(tmp_path / "rt_hdf5_uniform_0001")
    uni.load()
    with pytest.raises(ValueError, match="3D"):
        uni.flagship_analysis()
