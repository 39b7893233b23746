"""Fused z+y Pallas DFT vs the 3-einsum dense rfftn on TPU at 512^3:
compile, accuracy vs the XLA path, and timing (transforms only and the
full spectra step), at HIGH and HIGHEST in-kernel precision.

    python scripts/tpu_fused_zy_probe.py [n]
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
    from fava_tpu.experiments import pallas_dft
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

    def sink(ffts):
        return sum(jnp.sum(jnp.abs(f[:1, :1, :1])) for f in ffts)

    @jax.jit
    def dense3(d, a, b, c):
        sd = jnp.sqrt(d)
        return sink([dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)])

    @jax.jit
    def fused3(d, a, b, c):
        sd = jnp.sqrt(d)
        return sink([pallas_dft.rfftn_mxu_fused(sd * v) / ntot for v in (a, b, c)])

    @jax.jit
    def fused3_hi(d, a, b, c):
        sd = jnp.sqrt(d)
        p = jax.lax.Precision.HIGHEST
        return sink([pallas_dft.rfftn_mxu_fused(sd * v, p) / ntot for v in (a, b, c)])

    results["dense_s"] = timeit(dense3, dens, *vels)
    print(f"dense 3x transforms: {results['dense_s']*1e3:.1f} ms", flush=True)
    results["fused_s"] = timeit(fused3, dens, *vels)
    print(f"fused 3x transforms (HIGH): {results['fused_s']*1e3:.1f} ms", flush=True)
    results["fused_highest_s"] = timeit(fused3_hi, dens, *vels)
    print(f"fused 3x transforms (HIGHEST): {results['fused_highest_s']*1e3:.1f} ms", flush=True)

    # Accuracy: one volume, fused vs dense, reduced on device.
    @jax.jit
    def dev(a):
        f1 = dft.rfftn_mxu(a, jax.lax.Precision.HIGHEST)
        f2 = pallas_dft.rfftn_mxu_fused(a, jax.lax.Precision.HIGHEST)
        num = jnp.max(jnp.abs(jnp.real(f1 - f2))) + jnp.max(jnp.abs(jnp.imag(f1 - f2)))
        den = jnp.max(jnp.abs(jnp.real(f1))) + jnp.max(jnp.abs(jnp.imag(f1)))
        return num / den

    results["dev_highest"] = float(np.asarray(dev(vels[0])))
    print(f"fused vs dense deviation (HIGHEST): {results['dev_highest']:.2e}", flush=True)

    @jax.jit
    def dev_high(a):
        f1 = dft.rfftn_mxu(a, jax.lax.Precision.HIGHEST)
        f2 = pallas_dft.rfftn_mxu_fused(a)  # production precision
        num = jnp.max(jnp.abs(jnp.real(f1 - f2))) + jnp.max(jnp.abs(jnp.imag(f1 - f2)))
        den = jnp.max(jnp.abs(jnp.real(f1))) + jnp.max(jnp.abs(jnp.imag(f1)))
        return num / den

    results["dev_high"] = float(np.asarray(dev_high(vels[0])))
    print(f"fused(HIGH) vs dense(HIGHEST) deviation: {results['dev_high']:.2e}", flush=True)

    # Full spectra step with the fused transforms.
    @jax.jit
    def spectra_fused(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [pallas_dft.rfftn_mxu_fused(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        counts, sums = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return jnp.concatenate([counts[None], sums])

    results["spectra_fused_s"] = timeit(spectra_fused, dens, *vels)
    print(f"spectra step with fused transforms: {results['spectra_fused_s']*1e3:.1f} ms", flush=True)

    (ROOT / f"fused_zy_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
