"""Compile + validate + time the fused powers+fold+bin kernel on TPU
against the current materialize-powers path, at 512^3 (or argv[1]).

    python scripts/tpu_fused_bin_probe.py [n]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fava_tpu import utils as futils
    from fava_tpu.flagship import make_example_fields
    from fava_tpu.experiments import planar_dft
    from fava_tpu.ops import dft, pallas_kernels as pk
    from fava_tpu.ops.spectra import rfft_power_volumes

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nbins = n // 2 - 1
    ntot = n * n * n
    results = {"n": n}

    fields = make_example_fields(n=n)
    dens, vels = fields[0], fields[1:]

    def timeit(fn, *args, repeats=3):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    t_floor = timeit(tiny, jnp.zeros(8), repeats=6)
    results["floor_s"] = t_floor
    print(f"floor {t_floor*1e3:.1f} ms", flush=True)

    # --- current path: complex transforms -> powers -> fold -> bin ---
    @jax.jit
    def current(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        counts, sums = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return jnp.concatenate([counts[None], sums])

    t_cur = timeit(current, dens, *vels)
    results["current_s"] = t_cur
    print(f"current spectra path: {t_cur*1e3:.1f} ms", flush=True)

    # --- fused path: planar transforms -> fused kernel ---
    @jax.jit
    def fused(d, a, b, c):
        sd = jnp.sqrt(d)
        re, im = planar_dft.rfftn_mxu_planar_stacked([sd * v for v in (a, b, c)])
        counts, sums = pk.shell_bin_powers_fused(re / ntot, im / ntot, nbins, n)
        return jnp.concatenate([counts[None], sums])

    t_fused = timeit(fused, dens, *vels)
    results["fused_s"] = t_fused
    print(f"fused spectra path: {t_fused*1e3:.1f} ms", flush=True)

    ref = np.asarray(current(dens, *vels), dtype=np.float64)
    got = np.asarray(fused(dens, *vels), dtype=np.float64)
    dev = np.abs(got - ref).max() / np.abs(ref).max()
    results["max_scaled_dev"] = float(dev)
    print(f"max scaled deviation fused vs current: {dev:.2e}", flush=True)

    (ROOT / f"fused_bin_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
