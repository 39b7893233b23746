"""On-TPU breakdown of the 512^3 flagship step (VERDICT round-2 item 1).

Times the full fused step plus its constituent kernels one by one, and
measures an achievable-HBM-bandwidth reference (saxpy over the same
volume) so docs/perf.md can state a roofline. Writes perf_<n>.json.

Run on the real chip (never concurrently with another TPU job):
    python scripts/tpu_profile.py [n]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sync_scalar(x) -> float:
    return float(np.asarray(x))


def _time(fn, *args, repeats: int = 3) -> float:
    _sync_scalar(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync_scalar(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fava_tpu import utils as futils
    from fava_tpu.flagship import jitted_analysis_step, make_example_fields
    from fava_tpu.ops import pallas_kernels as pk
    from fava_tpu.ops.spectra import rfft_power_volumes

    futils.enable_compilation_cache(str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    futils.timing.VERBOSE = False

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nbins = n // 2 - 1
    results = {"n": n, "platform": jax.devices()[0].platform}

    print(f"building {n}^3 fields...", flush=True)
    fields = make_example_fields(n=n)
    for f in fields:
        f.block_until_ready()
    dens, vels = fields[0], fields[1:]
    fbytes = 4 * n * n * n

    # --- achievable HBM bandwidth reference: saxpy reads 1, writes 1 ---
    saxpy = jax.jit(lambda x: jnp.sum(2.0 * x + 1.0))
    t = _time(saxpy, dens)
    results["saxpy_s"] = t
    results["saxpy_gbps"] = 2 * fbytes / t / 1e9
    print(f"saxpy: {t*1e3:.1f} ms -> {results['saxpy_gbps']:.0f} GB/s", flush=True)

    # --- full fused step ---
    step = jitted_analysis_step(None)

    def run_step(*f):
        out = step(*f)
        return out["spectra_total"][1] + out["reynolds_stress"][0, 0]

    t = _time(run_step, *fields)
    results["full_step_s"] = t
    print(f"full step: {t*1e3:.1f} ms", flush=True)

    # --- single rfftn (scalar-reduced to avoid fetching the volume) ---
    one_fft = jax.jit(lambda x: jnp.sum(jnp.abs(jnp.fft.rfftn(x))))
    t = _time(one_fft, vels[0])
    results["one_rfftn_s"] = t
    print(f"one rfftn(+abs-sum): {t*1e3:.1f} ms", flush=True)

    three_fft = jax.jit(
        lambda d, a, b, c: sum(jnp.sum(jnp.abs(jnp.fft.rfftn(jnp.sqrt(d) * v))) for v in (a, b, c))
    )
    t = _time(three_fft, dens, *vels)
    results["three_rfftn_s"] = t
    print(f"three rfftn(+mul+abs-sum): {t*1e3:.1f} ms", flush=True)

    # --- powers + shell binning given precomputed ffts ---
    @jax.jit
    def powers_and_bin(d, a, b, c):
        ntot = n * n * n
        ffts = [jnp.fft.rfftn(jnp.sqrt(d) * v) / ntot for v in (a, b, c)]
        total, longi, trans, _ = rfft_power_volumes(ffts, (n, n, n))
        counts, sums3 = pk.shell_bin_sums_rfft(total, longi, trans, nbins, n)
        return sums3[0][1]

    t = _time(powers_and_bin, dens, *vels)
    results["fft_powers_bin_s"] = t
    print(f"ffts+powers+shell-bin: {t*1e3:.1f} ms", flush=True)

    # --- profile kernels ---
    t = _time(jax.jit(lambda d, a, b, c: jnp.sum(pk.row_moments_volume(d, a, b, c))), dens, *vels)
    results["row_moments_s"] = t
    print(f"row_moments_volume: {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def centered(d, a, b, c):
        m = pk.row_moments_volume(d, a, b, c)
        means = m[1:4] / (n * n)
        return jnp.sum(pk.centered_row_moments(d, a, b, c, means))

    t = _time(centered, dens, *vels)
    results["moments_plus_centered_s"] = t
    print(f"raw+centered moments: {t*1e3:.1f} ms", flush=True)

    # --- batched AMR kernels on an equivalent-cell stack ---
    nb = max(1, (n // 128) ** 3)
    shape = (nb, 128, 128, 128) if n >= 128 else (8, n // 2, n // 2, n // 2)
    stack = [jnp.broadcast_to(v[: shape[1], : shape[2], : shape[3]], shape) + 0.0 for v in fields]

    @jax.jit
    def block_moments(d, a, b, c):
        raw = pk.block_row_moments(d, a, b, c)
        mu = raw[1:4] / (shape[2] * shape[3])
        cen = pk.block_centered_row_moments(d, a, b, c, mu)
        return jnp.sum(raw) + jnp.sum(cen)

    t = _time(block_moments, *stack)
    results["block_stack_moments_s"] = t
    results["block_stack_shape"] = list(shape)
    print(f"batched AMR moments {shape}: {t*1e3:.1f} ms", flush=True)

    # --- dispatch floor ---
    tiny = jax.jit(lambda x: jnp.sum(x + 1.0))
    t = _time(tiny, jnp.zeros(8), repeats=5)
    results["dispatch_floor_s"] = t
    print(f"dispatch floor: {t*1e3:.1f} ms", flush=True)

    out_path = Path(__file__).resolve().parents[1] / f"perf_{n}.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
