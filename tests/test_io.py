"""FLASH file I/O: write/read roundtrips, axis swaps, parameter tables."""

import h5py
import numpy as np

from fava_tpu.io import flash_file, synthetic


def test_uniform_file_roundtrip(tmp_path):
    path = tmp_path / "rt_hdf5_uniform_0005"
    synthetic.make_uniform_file(path, ncells=(8, 6, 4))

    with h5py.File(path, "r") as f:
        scalars = flash_file.read_scalars(f)
        runtime = flash_file.read_runtime_parameters(f)
        names = flash_file.read_unknown_names(f)
        dens = flash_file.read_field(f, "dens")
        meta = flash_file.read_block_metadata(f)

    assert scalars["integer"]["nxb"] == 8
    assert scalars["integer"]["nyb"] == 6
    assert scalars["integer"]["nzb"] == 4
    assert scalars["string"]["geometry"] == "cartesian"
    assert runtime["real"]["xmax"] == 1.0
    assert set(names) == set(synthetic.DEFAULT_FIELDS)
    # Axis swap: file stores (nz, ny, nx); reader returns (nx, ny, nz).
    # Uniform files hold the bare 3D volume (as written by from_amr).
    assert dens.shape == (8, 6, 4)
    assert meta["bounding box"].shape == (1, 3, 2)


def test_field_axis_swap_is_involutive(tmp_path):
    path = tmp_path / "x_hdf5_uniform_0001"
    rng = np.random.default_rng(0)
    data = {"dens": rng.random((6, 5, 4)) + 1.0}
    synthetic.make_uniform_file(path, ncells=(6, 5, 4), field_data=data)

    with h5py.File(path, "r") as f:
        read = flash_file.read_field(f, "dens")
        raw = f["dens"][()]

    assert raw.shape == (4, 5, 6)  # file order (nz, ny, nx)
    np.testing.assert_allclose(read.squeeze(), data["dens"], rtol=1e-6)


def test_amr_tree_consistency(tmp_path):
    path = tmp_path / "rt_hdf5_plt_cnt_0004"
    synthetic.make_amr_file(path, ncells=(4, 4, 4), nblks=(2, 1, 1), refine={1: 2})

    with h5py.File(path, "r") as f:
        meta = flash_file.read_block_metadata(f)

    node_type = meta["node type"]
    refine_level = meta["refine level"]
    bounds = meta["bounding box"]
    # 2 roots, one refined into 8 children -> 10 blocks, 9 leaves.
    assert len(node_type) == 10
    assert (node_type == 1).sum() == 9
    assert refine_level.max() == 2
    # Leaves tile the domain: total leaf volume == domain volume.
    leaf_vol = sum(np.prod(bounds[b, :, 1] - bounds[b, :, 0]) for b in np.nonzero(node_type == 1)[0])
    np.testing.assert_allclose(leaf_vol, 1.0)


def test_amr_mesh_save_reload_roundtrip(tmp_path):
    from fava_tpu.mesh import FLASH as FlashAMR

    src = tmp_path / "rt_hdf5_plt_cnt_0001"
    synthetic.make_amr_file(src, ncells=(4, 4, 4), nblks=(2, 1, 1), refine={0: 2})
    mesh = FlashAMR(src)
    mesh.load()
    mesh.load_data(["dens", "velx"])

    out = tmp_path / "copy_hdf5_plt_cnt_0001"
    mesh.save(filename=out, names=["dens", "velx"])

    mesh2 = FlashAMR(out)
    mesh2.load()
    assert mesh2.nblocks == mesh.nblocks
    assert mesh2.refine_level_max == mesh.refine_level_max
    np.testing.assert_allclose(mesh2.block_bounds, mesh.block_bounds, rtol=1e-6)
    # plt files round-trip through float32 on disk.
    np.testing.assert_allclose(
        np.asarray(mesh2.data("dens")), np.asarray(mesh.data("dens")), rtol=1e-6
    )
    assert set(mesh2.fields) == {"dens", "velx"}


def test_particle_file_roundtrip(tmp_path):
    path = tmp_path / "rt_hdf5_part_0002"
    synthetic.make_particle_file(path, nparticles=32)
    with h5py.File(path, "r") as f:
        meta = flash_file.read_particle_metadata(f)
        parts = flash_file.read_particles(f, meta["particle names"], select=["tag", "velx"])
    assert meta["integer scalars"]["globalnumparticles"] == 32
    assert set(parts.keys()) == {"tag", "velx"}
    assert parts["tag"].shape == (32,)


def test_amr_region_refinement_and_field_fns(tmp_path):
    """refine_fn refines every block overlapping a region to a uniform
    fine level (all 8 children split, unlike the legacy first-child
    ``refine`` dict), and field_fns overrides the analytic fields —
    the rtflame-style catalog the pipeline bench generates."""
    domain = np.array([[0.0, 2.0], [0.0, 1.0], [0.0, 1.0]])

    def refine_fn(bounds, level):
        # fine band around x = 0.75
        return 3 if bounds[0, 1] > 0.5 and bounds[0, 0] < 1.0 else 1

    path = synthetic.make_amr_file(
        tmp_path / "rt_hdf5_plt_cnt_0009",
        ncells=(4, 4, 4),
        nblks=(4, 2, 2),
        domain=domain,
        refine_fn=refine_fn,
        fields=("dens",),
        field_fns={"dens": lambda x, y, z: 2.0 + x},
    )
    from fava_tpu.mesh import FLASH as FlashAMR

    mesh = FlashAMR(path)
    mesh.load()
    leaves = mesh.get_blocklist()
    levels = np.asarray(mesh.refine_level)[leaves]
    bounds = np.asarray(mesh.block_bounds)[leaves]
    in_band = (bounds[:, 0, 1] > 0.5) & (bounds[:, 0, 0] < 1.0)
    # the band is uniformly at level 3; everything else stays level 1
    assert (levels[in_band] == 3).all() and (levels[~in_band] == 1).all()
    # band snaps to root column [0.5, 1.0): 1 col x 2x2 transverse
    # roots, each split twice (level 3) -> 4 * 8^2 = 256 fine leaves
    assert in_band.sum() == 256
    dens = np.asarray(mesh.data("dens"))
    centers = 0.5 * (bounds[:, :, 0] + bounds[:, :, 1])
    # field_fn override: block means equal 2 + x_center exactly for the
    # linear field (cell-average of a linear function = center value)
    np.testing.assert_allclose(dens[leaves].mean(axis=(1, 2, 3)), 2.0 + centers[:, 0], rtol=1e-6)


def test_write_unknown_names_rejects_long_names(tmp_path):
    """FLASH 'unknown names' records are S4: numpy silently truncates
    longer names (corrupt-on-write) — the writer must raise instead."""
    import pytest

    with h5py.File(tmp_path / "x.h5", "w") as f:
        with pytest.raises(ValueError, match="4 characters"):
            flash_file.write_unknown_names(f, ["dens", "myfield"])
        flash_file.write_unknown_names(f, ["dens", "velx"])
