"""Stage-by-stage timing of the 512^3 spectra sub-step on TPU.

Times (a) transforms only, (b) +powers, (c) +fold, (d) +bin (full),
each as ONE jit so the dispatch floor is paid identically, to locate
where the ~75 ms of device time actually goes.

    python scripts/tpu_spectra_stage_probe.py [n]
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

    def timeit(fn, *args, repeats=3):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    results["floor_s"] = timeit(tiny, jnp.zeros(8), repeats=6)

    @jax.jit
    def transforms_only(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        # Cheap scalar sink so nothing is DCE'd.
        return sum(jnp.sum(jnp.abs(f[:1, :1, :1])) for f in ffts)

    @jax.jit
    def plus_powers(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        return jnp.sum(total[:1, :1]) + jnp.sum(longi[:1, :1]) + jnp.sum(trans[:1, :1])

    @jax.jit
    def full(d, a, b, c):
        sd = jnp.sqrt(d)
        ffts = [dft.rfftn_mxu(sd * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        counts, sums = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return jnp.concatenate([counts[None], sums])

    results["transforms_s"] = timeit(transforms_only, dens, *vels)
    results["plus_powers_s"] = timeit(plus_powers, dens, *vels)
    results["full_s"] = timeit(full, dens, *vels)
    for k, v in results.items():
        if k != "n":
            print(f"{k}: {v*1e3:.1f} ms", flush=True)

    (ROOT / f"spectra_stages_{n}.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
