"""512^3 on-chip timings for the round-3 analysis suite.

Writes NEWOPS_512.json: amortized per-call wall times (tunnel dispatch
floor included once per call — timings sync by fetching the small
outputs, per CLAUDE.md) for turbulence_summary, two_point_correlation,
velocity_correlations, decomposed/anisotropic spectra, density_pdf,
and the uniform projection at n=512. Fields are the flagship trig
synthesis (no jax.random: its first dispatch is minutes and uncached).
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402


def main() -> None:
    from fava_tpu import utils as futils

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    futils.timing.VERBOSE = False

    import jax.numpy as jnp

    from fava_tpu.flagship import make_example_fields
    from fava_tpu.ops import projection as proj_ops
    from fava_tpu.ops import twopoint as tp_ops
    from fava_tpu.ops import velocity as vel_ops
    from fava_tpu.ops.volume import density_pdf

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dens, vx, vy, vz = make_example_fields(n=n)
    xs = 2.0 * np.pi * jnp.arange(n, dtype=jnp.float32) / n
    pres = 2.0 + 0.5 * jnp.sin(xs[:, None, None]) * jnp.cos(2.0 * xs[None, :, None]) + 0.1 * jnp.cos(
        xs[None, None, :]
    )
    d = 1.0 / n

    def timed(name, fn, reps=3):
        fn()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return dt

    report = {"n": n, "reps": 3, "amortized_wall_s": {}}
    rec = report["amortized_wall_s"]
    rec["turbulence_summary"] = timed(
        "turbulence_summary",
        lambda: vel_ops.turbulence_summary(vx, vy, vz, dens=dens, pres=pres),
    )
    rec["two_point_correlation"] = timed(
        "two_point_correlation", lambda: tp_ops.two_point_correlation(dens)
    )
    rec["velocity_correlations"] = timed(
        "velocity_correlations", lambda: tp_ops.velocity_correlations(vx, vy, vz)
    )
    rec["decomposed_ke_spectra"] = timed(
        "decomposed_ke_spectra",
        lambda: vel_ops.decomposed_ke_spectra(vx, vy, vz, dens=dens),
    )
    rec["anisotropic_ke_spectra"] = timed(
        "anisotropic_ke_spectra", lambda: vel_ops.anisotropic_ke_spectra(vx, vy, vz)
    )
    rec["density_pdf"] = timed(
        "density_pdf", lambda: density_pdf(dens, nbins=200, mach=1.5)
    )
    from fava_tpu.ops import gradients as grad_ops

    rec["velocity_gradient_statistics"] = timed(
        "velocity_gradient_statistics",
        lambda: grad_ops.velocity_gradient_statistics(vx, vy, vz),
    )
    rec["gradient_invariant_pdfs"] = timed(
        "gradient_invariant_pdfs",
        lambda: grad_ops.gradient_invariant_pdfs(vx, vy, vz),
    )
    from fava_tpu.ops import structure as st_ops

    bounds = np.array([[0.0, 1.0]] * 3)
    rec["velocity_increment_pdfs"] = timed(
        "velocity_increment_pdfs",
        lambda: st_ops.velocity_increment_pdfs(
            [vx, vy, vz], domain_bounds=bounds, num_seps=8, num_points=65536
        ),
    )
    from fava_tpu.ops.volume import binned_statistic

    rec["binned_statistic"] = timed(
        "binned_statistic",
        lambda: binned_statistic(dens, vx, nbins=100),
    )
    rec["projection_uniform"] = timed(
        "projection_uniform",
        lambda: proj_ops.project_uniform(dens, (d, d, d), axis=0, weight=dens),
    )
    (ROOT / f"NEWOPS_{n}.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
