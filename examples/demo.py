"""End-to-end demo against a synthetic FLASH dataset.

Counterpart of the reference dev script (fava/__test__.py:13-43), but
runnable anywhere: fabricates a small rtflame-like dataset, then drives
the AMR and uniform analysis paths.

    python examples/demo.py [--cpu]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="run on CPU with 8 virtual devices")
    parser.add_argument("--data", type=str, default=None, help="existing FLASH data directory")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import fava_tpu
    from fava_tpu.io import synthetic

    if args.data:
        data_dir = Path(args.data)
    else:
        data_dir = Path(tempfile.mkdtemp(prefix="fava_tpu_demo_"))
        print(f"Fabricating synthetic FLASH dataset in {data_dir}")
        for i, t in enumerate([0.0, 0.1, 0.2], start=1):
            synthetic.make_amr_file(
                data_dir / f"rt_hdf5_plt_cnt_{i:04d}",
                ncells=(8, 8, 8),
                nblks=(2, 2, 2),
                refine={0: 2, 7: 3},
                time=t,
            )
        synthetic.make_uniform_file(data_dir / "rt_hdf5_uniform_0001", ncells=(32, 32, 32), seed=1)
        synthetic.make_particle_file(data_dir / "rt_hdf5_part_0001", nparticles=256)

    model = fava_tpu.FLASH(data_dir)

    print("\n=== AMR analyses (plt) ===")
    model.load(file_type="plt")
    radius, stress, means = model.reynolds_stress()
    print("Rxx peak:", float(np.max(stress["Rxx"])))
    fav = model.favre_profiles()
    print("Favre RMS velx mean:", float(np.mean(fav["favre_rms"]["velx"])))
    print("volume_average(dens):", model.volume_average("dens"))
    print("mass_sum:", model.mass_sum())

    print("\n=== Regrid (from_amr) ===")
    model.mesh.from_amr(fields=["dens", "velx", "vely", "velz", "flam"], save_file=False)
    print("uniform grid:", tuple(model.mesh.nCellsVec))

    print("\n=== Uniform analyses (uni) ===")
    model.load(file_type="uni")
    spec = model.kinetic_energy_spectra()
    print("spectra total[1:5]:", spec["total"][1:5])
    fd = model.fractal_dimension(field="flam", contours=0.5)
    print("fractal dimension:", fd)
    vsfs = model.structure_functions(num_seps=8, num_points=512, sep_bounds=[0.05, 0.4])
    print("S2 longitudinal:", vsfs["longitudinal"]["2"][:4])
    ts = model.turbulence_summary()
    print("u_rms:", ts["u_rms"], " integral scale:", ts["integral_scale"], " sigma_s:", ts["sigma_s"])
    dp = model.density_pdf(nbins=32)
    print("density PDF: sigma_s =", dp["sigma_s"], " lognormal residual =", dp["lognormal_residual"])
    vc = model.velocity_correlations()
    print("Karman-Howarth L11_x:", vc["L11_x"], " isotropy ratio:", vc["isotropy_ratio_x"])
    vg = model.velocity_gradient_statistics()
    print(
        "gradient stats: skewness =", vg["derivative_skewness"],
        " flatness =", vg["derivative_flatness"],
        " taylor microscale =", vg["taylor_microscale_mean"],
    )
    bs = model.binned_statistic("dens", "velx", nbins=8)
    print("conditional <velx|dens>:", np.round(bs["mean"], 3))
    ip = model.velocity_increment_pdfs(num_seps=4, num_points=4096, nbins=41)
    print(
        "increment PDFs: longitudinal flatness vs r =",
        np.round(ip["longitudinal"]["flatness"], 3),
    )
    pm = model.projection(field="dens", axis=0)
    print("column-density map:", pm["map"].shape, " total:", float(pm["map"].sum()))

    print("\n=== In-memory arrays (no FLASH file) ===")
    import numpy as _np

    rng = _np.random.default_rng(7)
    mm = fava_tpu.from_arrays(
        {
            "dens": 1.0 + 0.3 * rng.random((16, 16, 16)),
            "velx": rng.standard_normal((16, 16, 16)),
            "vely": rng.standard_normal((16, 16, 16)),
            "velz": rng.standard_normal((16, 16, 16)),
        }
    )
    print("from_arrays u_rms:", mm.turbulence_summary()["u_rms"])

    print("\n=== Time series (async ingest) ===")
    series = model.favre_series(file_type="plt")
    print("favre series shape:", series["favre_mean_velx"].shape)

    print("\n=== Particles ===")
    model.load(file_type="prt")
    print("particle velx stats:", model.particles.statistics(["velx"])["velx"])

    import jax

    if len(jax.devices()) >= 8:
        print("\n=== Pod series (snap x space mesh) ===")
        from fava_tpu.parallel import make_device_mesh, use_mesh

        for i in (2, 3):
            synthetic.make_uniform_file(
                data_dir / f"rt_hdf5_uniform_{i:04d}", ncells=(32, 32, 32), seed=i
            )
        model = fava_tpu.FLASH(data_dir)
        with use_mesh(make_device_mesh((2, 4), ("snap", "space"))):
            pod = model.flagship_series()
        print("pod flagship series spectra shape:", pod["spectra_total"].shape)


if __name__ == "__main__":
    main()
