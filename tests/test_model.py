"""Model registries, file catalogs, and load dispatch."""

import numpy as np
import pytest

import fava_tpu
from fava_tpu import FileType, Model
from fava_tpu.io import synthetic


def test_mesh_registry_contents():
    names = Model.mesh_names()
    for expected in ("FLASH", "FlashUniform", "FlashParticles", "Structured", "Unstructured"):
        assert expected in names


def test_analysis_registry_contents():
    for name in (
        "reynolds_stress",
        "slice_average",
        "slice_integration",
        "volume_average",
        "volume_integration",
        "fractal_dimension",
        "kinetic_energy_spectra",
        "structure_functions",
        "pdf1d",
        "pdf2d",
        "mass_sum",
        "favre_profiles",
        "eulerian_autocorrelation",
        "lagrangian_autocorrelation",
        "cross_correlation",
    ):
        assert hasattr(Model, name), name


@pytest.fixture()
def model_dir(tmp_path):
    synthetic.make_amr_file(tmp_path / "rt_hdf5_plt_cnt_0001", ncells=(4, 4, 4), nblks=(1, 1, 1))
    synthetic.make_amr_file(tmp_path / "rt_hdf5_plt_cnt_0003", ncells=(4, 4, 4), nblks=(1, 1, 1))
    synthetic.make_amr_file(tmp_path / "rt_hdf5_chk_0002", ncells=(4, 4, 4), nblks=(1, 1, 1))
    synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 8))
    synthetic.make_particle_file(tmp_path / "rt_hdf5_part_0001", nparticles=16)
    return tmp_path


def test_catalogs_and_nfiles(model_dir):
    m = fava_tpu.FLASH(model_dir)
    assert m.nfiles(file_type="plt") == 2
    assert m.nfiles(file_type="chk") == 1
    assert m.nfiles(file_type="uni") == 1
    assert m.nfiles(file_type="prt") == 1
    assert m.nfiles(file_type=FileType.ANL) == 0
    assert sorted(m.plt_files["by number"].keys()) == [1, 3]
    assert sorted(m.plt_files["by index"].keys()) == [0, 1]


def test_load_dispatch(model_dir):
    m = fava_tpu.FLASH(model_dir)
    m.load(file_type="plt")
    assert m.mesh is not None and m.particles is None
    assert m.mesh.mesh_type == "FLASH"

    m.load(file_type="uni")
    assert m.mesh.mesh_type == "FlashUniform"

    m.load(file_type="prt")
    assert m.particles is not None and m.mesh is None

    m.load(file_number=3, file_type="plt")
    assert "0003" in m.mesh.filename.name


def test_convert_filename_type(model_dir):
    m = fava_tpu.FLASH(model_dir)
    m.load(file_type="plt")
    anl = m.convert_filename_type("plt", "anl")
    assert "hdf5_analysis_0001" in str(anl)
    uni = m.convert_filename_type("plt", "uni")
    assert "hdf5_uniform_0001" in str(uni)


def test_generic_model_load_sniffing(model_dir):
    m = Model(model_dir)
    # files are sorted: chk comes first
    m.load(0)
    assert m.mesh.mesh_type in ("FLASH", "FlashParticles")


def test_load_unknown_file_raises(tmp_path):
    from fava_tpu.utils import InvalidMeshError

    (tmp_path / "random.txt").write_text("not flash data")
    m = Model(tmp_path)
    with pytest.raises(InvalidMeshError):
        m.load(0)


def test_register_analysis_overwrite():
    @Model.register_analysis()
    def _tmp_analysis(self):
        return 1

    assert Model._tmp_analysis(None) == 1

    # Without overwrite, re-registration keeps the original.
    @Model.register_analysis()
    def _tmp_analysis(self):  # noqa: F811
        return 2

    assert Model._tmp_analysis(None) == 1

    @Model.register_analysis(overwrite=True)
    def _tmp_analysis(self):  # noqa: F811
        return 3

    assert Model._tmp_analysis(None) == 3
    delattr(Model, "_tmp_analysis")


def test_save_to_hdf5_roundtrip(model_dir, tmp_path):
    m = fava_tpu.FLASH(model_dir)
    out = tmp_path / "out_hdf5_analysis_0001"
    data = {"group": {"sub": {"a": np.arange(4)}, "b": 3.5}, "c": np.eye(2)}
    m.save_to_hdf5(data, out)
    # Overwrite of an existing dataset must not raise.
    m.save_to_hdf5({"group": {"b": 4.5}}, out)

    import h5py

    with h5py.File(out, "r") as f:
        assert f["group"]["sub"]["a"][()].tolist() == [0, 1, 2, 3]
        assert f["group"]["b"][()] == 4.5
        assert f["c"].shape == (2, 2)
    assert m.hdf5_key_exists("group", out)
    assert not m.hdf5_key_exists("nope", out)


def test_catalog_skips_non_numeric_suffixes(tmp_path):
    """A stray 4-char non-numeric suffix matching the ???? glob (e.g.
    *_hdf5_chk_orig) must be skipped, not crash FLASH() construction."""
    from fava_tpu.io import synthetic

    synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 8))
    (tmp_path / "rt_hdf5_chk_orig").write_bytes(b"junk")
    (tmp_path / "rt_hdf5_uniform_tmp1").write_bytes(b"junk")
    m = fava_tpu.FLASH(tmp_path)
    assert m.nfiles(file_type="uni") == 1
    assert m.nfiles(file_type="chk") == 0


def test_nfiles_accepts_positional_file_type(tmp_path):
    from fava_tpu.io import synthetic

    synthetic.make_uniform_file(tmp_path / "rt_hdf5_uniform_0001", ncells=(8, 8, 8))
    m = fava_tpu.FLASH(tmp_path)
    assert m.nfiles("uni") == 1  # positional used to silently count CHK
    assert m.nfiles() == 0


def test_convert_filename_type_marker_replace(tmp_path):
    """The hdf5_<substem>_ MARKER is replaced, not the bare substem: a
    basename containing 'chk' must not be mangled; combined chk_prt /
    plt_prt types convert via their mesh substem."""
    from fava_tpu.io import synthetic

    synthetic.make_uniform_file(tmp_path / "chkboard_hdf5_uniform_0040", ncells=(8, 8, 8))
    m = fava_tpu.FLASH(tmp_path)
    m.load(file_type="uni")
    anl = m.convert_filename_type("uni", "anl")
    assert anl.name == "chkboard_hdf5_analysis_0040"
    # combined types (mesh + particles) use the mesh substem
    assert m.convert_filename_type("uni", "chk_prt").name == "chkboard_hdf5_chk_0040"


def test_directory_reassignment_rebuilds_catalogs(tmp_path):
    from fava_tpu.io import synthetic

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    synthetic.make_uniform_file(a / "rt_hdf5_uniform_0001", ncells=(8, 8, 8))
    synthetic.make_uniform_file(b / "rt_hdf5_uniform_0001", ncells=(8, 8, 8))
    synthetic.make_uniform_file(b / "rt_hdf5_uniform_0002", ncells=(8, 8, 8))
    m = fava_tpu.FLASH(a)
    assert m.nfiles("uni") == 1
    m.directory = b
    assert m.nfiles("uni") == 2  # catalogs follow the directory
    m.load(file_type="uni", file_index=1)
    assert "0002" in m.mesh.filename.name
