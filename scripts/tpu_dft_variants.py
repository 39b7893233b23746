"""Time MXU DFT variants at 512^3 on the TPU: dense vs two-stage CT,
Precision.HIGHEST vs HIGH, against the XLA FFT lowering. Feeds the
rfftn_fast dispatch decision in ops/dft.py and docs/perf.md.

    python scripts/tpu_dft_variants.py [n]
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
    from fava_tpu.ops import dft

    futils.enable_compilation_cache(str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    results = {"n": n, "platform": jax.devices()[0].platform}

    x = make_example_fields(n=n)[1]
    x.block_until_ready()

    tiny = jax.jit(lambda v: jnp.sum(v + 1.0))
    t_floor = _timeit(tiny, jnp.zeros(8), repeats=6)
    results["dispatch_floor_s"] = t_floor
    print(f"floor {t_floor*1e3:.1f} ms", flush=True)

    HIGHEST = jax.lax.Precision.HIGHEST
    HIGH = jax.lax.Precision.HIGH

    def dense(v, prec):
        return dft.rfftn_mxu(v, prec)

    # Two-stage (four-step Cooley-Tukey) split kept INLINE here: it
    # measured slower than the dense DFT (see ops/dft.py NOTE) and was
    # not shipped, but the artifact must stay reproducible.
    import numpy as _np
    from functools import lru_cache

    @lru_cache(maxsize=8)
    def ct_mats(n, n1):
        n2 = n // n1
        j1, j2 = _np.arange(n1), _np.arange(n2)
        w1 = _np.exp(-2j * _np.pi * j1[:, None] * j1[None, :] / n1).astype(_np.complex64)
        w2 = _np.exp(-2j * _np.pi * j2[:, None] * j2[None, :] / n2).astype(_np.complex64)
        tw = _np.exp(-2j * _np.pi * j1[:, None] * j2[None, :] / n).astype(_np.complex64)
        return w1, w2, tw

    def fft_axis_ct(x, axis, prec):
        # X[k1 + n1*k2] = sum_j2 W_n2^{j2 k2} tw[k1,j2] sum_j1 W_n1^{j1 k1} x[j1*n2+j2]
        n = x.shape[axis]
        n1 = max(2, n // 128)
        w1, w2, tw = ct_mats(n, n1)
        moved = jnp.moveaxis(x, axis, -1)
        lead = moved.shape[:-1]
        a = moved.reshape(*lead, n1, n // n1)
        b = jnp.einsum("...jz,jk->...kz", a, w1, precision=prec)
        d = jnp.einsum("...kj,jl->...kl", b * tw, w2, precision=prec)
        out = jnp.swapaxes(d, -1, -2).reshape(*lead, n)
        return jnp.moveaxis(out, -1, axis)

    def ct(v, prec):
        w = dft.rfft_trailing(v, prec)
        w = fft_axis_ct(w, 1, prec)
        return fft_axis_ct(w, 0, prec)

    variants = {
        "xla_fft": lambda v: jnp.fft.rfftn(v),
        "dense_highest": lambda v: dense(v, HIGHEST),
        "dense_high": lambda v: dense(v, HIGH),
        "ct_highest": lambda v: ct(v, HIGHEST),
        "ct_high": lambda v: ct(v, HIGH),
    }

    # --- amortized timing: K transforms inside one jit ---
    K = 4
    for name, f in variants.items():

        @jax.jit
        def loop(v, f=f):
            def body(i, carry):
                w = f(carry)
                return carry + 1e-12 * jnp.abs(w[:, :, 0])[:, :, None]

            return jax.lax.fori_loop(0, K, body, v)[0, 0, 0]

        t = _timeit(loop, x)
        per = (t - t_floor) / K
        results[f"{name}_s"] = per
        print(f"{name}: {per*1e3:.1f} ms amortized", flush=True)

    # --- deviation vs the XLA FFT, on-device (complex fetch is
    # unimplemented on this backend; reduce to scalars) ---
    @jax.jit
    def devs(v):
        ref = jnp.fft.rfftn(v)
        scale = jnp.max(jnp.abs(ref))
        out = {}
        for name, f in list(variants.items())[1:]:
            w = f(v)
            out[name + "_maxdev"] = jnp.max(jnp.abs(w - ref)) / scale
            # power-level deviation (what the spectra consume)
            pw = jnp.abs(w) ** 2
            pr = jnp.abs(ref) ** 2
            out[name + "_power_maxdev"] = jnp.max(jnp.abs(pw - pr)) / jnp.max(pr)
        return out

    d = jax.device_get(jax.tree.map(np.float64, devs(x)))
    results.update({k: float(v) for k, v in d.items()})
    for k, v in d.items():
        print(f"{k}: {float(v):.2e}", flush=True)

    out_path = Path(__file__).resolve().parents[1] / f"dft_variants_{n}.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
