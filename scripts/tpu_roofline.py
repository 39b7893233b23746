"""Dispatch-floor-free TPU microbenchmarks: HBM streaming bandwidth and
FFT throughput via in-jit fori_loop amortization. Feeds docs/perf.md.

    python scripts/tpu_roofline.py [n]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _timeit(fn, *args, repeats: int = 3) -> float:
    float(np.asarray(fn(*args)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fava_tpu import utils as futils
    from fava_tpu.flagship import make_example_fields

    futils.enable_compilation_cache(str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    results = {"n": n}
    fbytes = 4 * n * n * n

    fields = make_example_fields(n=n)
    x = fields[0]
    x.block_until_ready()

    # --- dispatch floor ---
    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    t_floor = _timeit(tiny, jnp.zeros(8), repeats=6)
    results["dispatch_floor_s"] = t_floor
    print(f"dispatch floor: {t_floor*1e3:.1f} ms", flush=True)

    # --- streaming bandwidth: K read+write passes inside one jit ---
    K = 16

    @jax.jit
    def pump(v):
        def body(i, acc):
            return acc * 1.0000001 + 1e-9

        out = jax.lax.fori_loop(0, K, body, v)
        return out[0, 0, 0]

    t = _timeit(pump, x)
    bw = K * 2 * fbytes / max(t - t_floor, 1e-9) / 1e9
    results["stream_s"] = t
    results["stream_gbps"] = bw
    print(f"stream ({K} passes): {t*1e3:.1f} ms -> {bw:.0f} GB/s", flush=True)

    # --- FFT throughput: K forward rfftn's amortized ---
    KF = 4

    @jax.jit
    def ffts(v):
        def body(i, carry):
            f = jnp.fft.rfftn(carry)
            # fold the spectrum back to a real volume cheaply so the
            # loop carry keeps a fixed shape (irfft would also work but
            # doubles the FFT count); use the real part padded back.
            return carry + 1e-12 * jnp.abs(f[:, :, 0])[:, :, None]

        out = jax.lax.fori_loop(0, KF, body, v)
        return out[0, 0, 0]

    t = _timeit(ffts, x)
    per_fft = (t - t_floor) / KF
    results["rfftn_amortized_s"] = per_fft
    print(f"rfftn amortized: {per_fft*1e3:.1f} ms each", flush=True)

    # --- single axis FFTs to see which pass dominates ---
    for axis, name in ((2, "fft_z_rfft"), (1, "fft_y_c2c"), (0, "fft_x_c2c")):
        if axis == 2:

            @jax.jit
            def one(v):
                return jnp.sum(jnp.abs(jnp.fft.rfft(v, axis=2)))

            t = _timeit(one, x)
        else:
            xc = jnp.fft.rfft(x, axis=2)
            xc.block_until_ready()

            @jax.jit
            def one(v, a=axis):
                return jnp.sum(jnp.abs(jnp.fft.fft(v, axis=a)))

            t = _timeit(one, xc)
        results[name + "_s"] = t
        print(f"{name}: {t*1e3:.1f} ms (incl floor)", flush=True)

    # --- power+binning traffic check: powers from precomputed ffts ---
    from fava_tpu.ops import pallas_kernels as pk
    from fava_tpu.ops.spectra import rfft_power_volumes

    ffts3 = [jnp.fft.rfftn(v) for v in fields[1:]]
    for f in ffts3:
        f.block_until_ready()
    nbins = n // 2 - 1

    @jax.jit
    def powers_only(a, b, c):
        total, longi, trans, _ = rfft_power_volumes([a, b, c], (n, n, n))
        return total[0, 0, 0] + longi[0, 0, 0]

    t = _timeit(powers_only, *ffts3)
    results["powers_only_s"] = t
    print(f"powers only: {t*1e3:.1f} ms (incl floor)", flush=True)

    @jax.jit
    def bin_only(a, b, c):
        total, longi, trans, _ = rfft_power_volumes([a, b, c], (n, n, n))
        counts, sums3 = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return sums3[0][1]

    t = _timeit(bin_only, *ffts3)
    results["powers_plus_bin_s"] = t
    print(f"powers+bin: {t*1e3:.1f} ms (incl floor)", flush=True)

    out_path = Path(__file__).resolve().parents[1] / f"roofline_{n}.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
