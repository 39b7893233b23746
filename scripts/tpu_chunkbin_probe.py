"""Time the rfft chunk shell-binning kernel on a full 512^3-class
half-spectrum (the pod sharded-spectra / out-of-core binning path).

    python scripts/tpu_chunkbin_probe.py [n] [tag]

Writes chunkbin_<n>_<tag>.json.
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
    from fava_tpu.ops import pallas_kernels as pk

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tag = sys.argv[2] if len(sys.argv) > 2 else "now"
    nbins = n // 2 - 1
    nzr = n // 2 + 1

    @jax.jit
    def powers():
        x = (jnp.arange(n, dtype=jnp.float32) / n)[:, None, None]
        y = (jnp.arange(n, dtype=jnp.float32) / n)[None, :, None]
        z = (jnp.arange(nzr, dtype=jnp.float32) / nzr)[None, None, :]
        t = jnp.abs(jnp.sin(37.0 * x + 17.0 * y + 5.0 * z)) + 0.01
        l = 0.5 * t * jnp.abs(jnp.cos(11.0 * x - 3.0 * y + 7.0 * z))
        return t, l

    t, l = powers()
    t.block_until_ready()

    @jax.jit
    def binned(t, l):
        c, s = pk.shell_bin_sums_rfft_chunk(t, l, t - l, nbins, n, n, jnp.asarray(0))
        return jnp.concatenate([c[None], s])

    @jax.jit
    def binned_values(t, l):
        s = pk.shell_bin_values_rfft_chunk(t, l, nbins, n, n, jnp.asarray(0))
        c = jnp.asarray(pk.rfft_shell_counts((n, n, n), nbins, "float32"))
        return jnp.concatenate([c[None], s])

    def timeit(fn, *args, repeats=3):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    floor = timeit(tiny, jnp.zeros(8), repeats=6)
    tb = timeit(binned, t, l)
    out = np.asarray(binned(t, l), dtype=np.float64)
    tv = timeit(binned_values, t, l)
    outv = np.asarray(binned_values(t, l), dtype=np.float64)
    np.testing.assert_allclose(outv, out, rtol=1e-6)
    results = {
        "n": n,
        "tag": tag,
        "floor_s": floor,
        "chunkbin_s": tb,
        "chunkbin_values_s": tv,
        "checksum": float(out.sum()),
    }
    print(f"[{tag}] values-only {tv*1e3:.1f} ms", flush=True)
    print(f"[{tag}] chunk binning {tb*1e3:.1f} ms (floor {floor*1e3:.1f}), checksum {out.sum():.6e}", flush=True)
    (ROOT / f"chunkbin_{n}_{tag}.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
