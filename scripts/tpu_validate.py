"""On-TPU accuracy artifact (VERDICT round-2 item 5).

Runs the f32 flagship step on the real chip at 128^3 and 256^3 and
compares every output against a float64 NumPy oracle implementing the
reference algorithms (full-grid FFT binning + centered two-pass
profiles). Records max scale-normalized errors in VALIDATION.json —
the concrete number behind "bit-for-bit where required, else
documented tolerance" (BASELINE.md north star).

    python scripts/tpu_validate.py [n ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def oracle_step(dens: np.ndarray, vels) -> dict:
    """f64 NumPy flagship oracle: full-grid spectra sums + x-profiles."""
    n = dens.shape[0]
    shape = dens.shape
    ntot = dens.size
    nbins = max(shape) // 2 - 1

    def wn(m):
        k = np.arange(m)
        return np.where(k <= (m - 1) // 2, k, k - m).astype(np.float64)

    kx = wn(shape[0])[:, None, None]
    ky = wn(shape[1])[None, :, None]
    kz = wn(shape[2])[None, None, :]
    k_abs = np.sqrt(kx**2 + ky**2 + kz**2)

    sd = np.sqrt(dens)
    total = np.zeros(shape)
    longi = np.zeros(shape, dtype=np.complex128)
    for k, v in zip((kx, ky, kz), vels):
        f = np.fft.fftn(sd * v, norm="forward")
        total += 0.5 * np.abs(f) ** 2
        longi += k * f
    longi_p = np.abs(longi / np.maximum(k_abs, 1e-99)) ** 2
    trans = total - longi_p

    idx = np.clip(np.floor(k_abs + 0.5).astype(int), 0, nbins - 1).ravel()
    mask = (k_abs <= nbins - 0.5).ravel()
    counts = np.bincount(idx, weights=mask, minlength=nbins)[:nbins]
    sums = {
        "spectra_total": np.bincount(idx, weights=np.where(mask, total.ravel(), 0), minlength=nbins)[:nbins],
        "spectra_longitudinal": np.bincount(idx, weights=np.where(mask, longi_p.ravel(), 0), minlength=nbins)[:nbins],
        "spectra_transverse": np.bincount(idx, weights=np.where(mask, trans.ravel(), 0), minlength=nbins)[:nbins],
        "spectra_counts": counts,
    }

    layer = shape[1] * shape[2]
    d_row = dens.sum(axis=(1, 2))
    means = [v.sum(axis=(1, 2)) / layer for v in vels]
    pairs = [(i, j) for i in range(3) for j in range(i, 3)]
    cv = [v - m[:, None, None] for v, m in zip(vels, means)]
    stress = np.stack([(dens * cv[i] * cv[j]).sum(axis=(1, 2)) / layer for i, j in pairs])
    fmean = np.stack([(dens * v).sum(axis=(1, 2)) / d_row for v in vels])
    frms = np.stack(
        [
            np.sqrt((dens * (v - f[:, None, None]) ** 2).sum(axis=(1, 2)) / d_row)
            for v, f in zip(vels, fmean)
        ]
    )
    return {
        **sums,
        "mean_dens": d_row / layer,
        "reynolds_stress": stress,
        "favre_mean": fmean,
        "favre_rms": frms,
        "total_mass": np.asarray(dens.sum()),
    }


def main() -> None:
    import jax

    from fava_tpu import utils as futils
    from fava_tpu.flagship import make_example_fields

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    futils.timing.VERBOSE = False

    sizes = [int(a) for a in sys.argv[1:]] or [128, 256]
    report = {
        "platform": jax.devices()[0].platform,
        "compute_dtype": "float32",
        "oracle": "float64 NumPy, reference algorithms (full-grid FFT binning, centered profiles)",
        "error_metric": "max |got - oracle| / max |oracle| per output",
        "dft_precision_default": "high (sizes); sizes_dft_highest records the validation-grade mode",
    }

    import jax as _jax

    from fava_tpu.flagship import uniform_analysis_step
    from fava_tpu.ops import dft

    for mode in ("high", "highest"):
        dft.PRECISION = dft._PRECISIONS[mode]
        # fresh jit per mode: the precision knob is read at trace time
        step = _jax.jit(lambda d, vx, vy, vz: uniform_analysis_step(d, vx, vy, vz, mesh=None))
        sizes_key = "sizes" if mode == "high" else "sizes_dft_highest"
        report[sizes_key] = {}
        for n in sizes:
            print(f"== {n}^3 dft={mode} ==", flush=True)
            fields = make_example_fields(n=n)
            t0 = time.perf_counter()
            out = step(*fields)
            host = {k: np.asarray(v, dtype=np.float64) for k, v in out.items()}
            wall = time.perf_counter() - t0

            dens = np.asarray(fields[0], dtype=np.float64)
            vels = [np.asarray(v, dtype=np.float64) for v in fields[1:]]
            ref = oracle_step(dens, vels)

            # Scale floors: the synthetic fields have integer trig
            # frequencies, so some oracle outputs are analytically ZERO
            # (e.g. favre_mean: row means of products of mismatched
            # harmonics) — dividing f32 noise by f64 noise is meaningless.
            # Those outputs are scaled by their physical fluctuation scale
            # instead (the Favre RMS / velocity magnitude).
            floors = {
                "favre_mean": np.abs(ref["favre_rms"]).max(),
                "mean_dens": np.abs(ref["mean_dens"]).max(),
            }
            errs = {}
            for key, exp in ref.items():
                got = host[key]
                scale = max(np.abs(exp).max(), floors.get(key, 0.0))
                err = float(np.abs(got - exp).max() / scale) if scale > 0 else float(np.abs(got).max())
                errs[key] = err
                print(f"  {key}: {err:.3e}", flush=True)
            report[sizes_key][str(n)] = {"wall_first_call_s": wall, "max_scaled_error": errs}

    (ROOT / "VALIDATION.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
