"""A/B the folded-v2 shell-binning kernel's IN-PROGRAM z segments on
TPU, inside the full spectra step (transforms + powers + fold + bin).

The z-GRID-chunk variant measured slower (extra programs); in-program
128-aligned segments run their own reachable-shell bound loops without
new programs, so the mask-loop work should drop ~2x at 512^3 (each
segment's kz spread bounds b_hi).

    python scripts/tpu_zsplit_probe.py [n]
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
    from fava_tpu.ops import dft, pallas_kernels as pk
    from fava_tpu.ops.spectra import rfft_power_volumes

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nbins = n // 2 - 1
    ntot = n * n * n
    results = {"n": n}

    fields = make_example_fields(n=n)
    dens, vels = fields[0], fields[1:]

    def timeit(fn, *args, repeats=5):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def powers(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        return total, longi

    def spectra_with_splits(z_splits):
        @jax.jit
        def run(d, a, b, c):
            total, longi = powers(d, a, b, c)
            folded = [pk._fold_quadrants(v) for v in (total, longi)]
            fshape = tuple(int(s) for s in folded[0].shape)
            t_sum, l_sum = pk._build_shell_folded_v2_fn(
                fshape, nbins, str(total.dtype), pk.FORCE_INTERPRET, n, n, n, z_splits
            )(*folded)
            return jnp.stack([t_sum, l_sum])

        return run

    def spectra_v3(xc, z_splits):
        @jax.jit
        def run(d, a, b, c):
            total, longi = powers(d, a, b, c)
            folded = [pk._fold_quadrants(v) for v in (total, longi)]
            fshape = tuple(int(s) for s in folded[0].shape)
            t_sum, l_sum = pk._build_shell_folded_v3_fn(
                fshape, nbins, str(total.dtype), pk.FORCE_INTERPRET, n, n, n, xc, z_splits
            )(*folded)
            return jnp.stack([t_sum, l_sum])

        return run

    ref = None
    for zs in (1, 2):
        fn = spectra_with_splits(zs)
        results[f"zsplit{zs}_s"] = timeit(fn, dens, *vels)
        print(f"z_splits={zs}: {results[f'zsplit{zs}_s']*1e3:.1f} ms", flush=True)
        got = np.asarray(fn(dens, *vels), dtype=np.float64)
        if ref is None:
            ref = got
        else:
            dev = np.abs(got - ref).max() / np.abs(ref).max()
            results[f"zsplit{zs}_dev"] = float(dev)
            print(f"  max scaled dev vs z_splits=1: {dev:.2e}", flush=True)

    # v3: x-blocked kernel (iteration-overhead amortization).
    for xc, zs in ((8, 1), (16, 1), (8, 2), (16, 2), (32, 2)):
        key = f"v3_x{xc}_z{zs}"
        try:
            fn = spectra_v3(xc, zs)
            results[f"{key}_s"] = timeit(fn, dens, *vels)
            got = np.asarray(fn(dens, *vels), dtype=np.float64)
            dev = np.abs(got - ref).max() / np.abs(ref).max()
            results[f"{key}_dev"] = float(dev)
            print(f"{key}: {results[f'{key}_s']*1e3:.1f} ms  dev={dev:.2e}", flush=True)
        except Exception as exc:
            results[f"{key}_error"] = str(exc)[:200]
            print(f"{key}: FAILED {str(exc)[:120]}", flush=True)

    (ROOT / f"zsplit_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
