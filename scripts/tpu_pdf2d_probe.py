"""A/B probe: pdf2d joint-histogram inner dot variants at 512^3.

The scatter-free pdf2d contracts interval one-hot matrices over the
sample axis (ops/volume._hist2d_fn). Counting-path variants probed:

  int8   - int8 one-hots, dot_general preferred_element_type=int32
           (the shipped r4 first cut; int8 matmuls may not lower to
           the MXU on this backend)
  bf16   - bf16 one-hots, plain f32-accumulating MXU dot, per-chunk
           result cast to int32 (EXACT: 0/1 products, per-bin
           per-chunk counts <= 2^21 < 2^24, f32 integer-exact)
  f32hi  - f32 one-hots, Precision.HIGHEST (the weighted path's dot)

Also times the fixed-range end-to-end pdf2d (isolates the auto-range
minmax fetch) and a fetch-free variant (device-resident result) to
split tunnel floor from device compute.

Writes pdf2d_probe_512.json.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402


def main() -> None:
    from fava_tpu import utils as futils

    futils.enable_compilation_cache(str(ROOT / ".jax_cache"))

    import jax
    import jax.numpy as jnp

    from fava_tpu.flagship import make_example_fields
    from fava_tpu.ops import volume as vol

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nbx = nby = 100
    dens, vx, _, _ = make_example_fields(n=n)
    np.asarray(dens.ravel()[:1])

    xedges = np.linspace(1.0, 2.0, nbx + 1)
    yedges = np.linspace(-2.0, 2.0, nby + 1)

    def make_hist(mode):
        @jax.jit
        def hist(xv, yv, xe, ye):
            x = xv.ravel()
            y = yv.ravel()
            c = min(vol._HIST2D_CHUNK, x.shape[0])
            xs = x.reshape(-1, c)
            ys = y.reshape(-1, c)
            dims = (((0,), (0,)), ((), ()))

            def step(acc, xy):
                xc, yc = xy
                if mode == "int8":
                    a = vol._interval_onehot(xc, xe, nbx, jnp.int8)
                    b = vol._interval_onehot(yc, ye, nby, jnp.int8)
                    h = jax.lax.dot_general(
                        a, b, dims, preferred_element_type=jnp.int32
                    )
                elif mode == "bf16":
                    a = vol._interval_onehot(xc, xe, nbx, jnp.bfloat16)
                    b = vol._interval_onehot(yc, ye, nby, jnp.bfloat16)
                    h = jax.lax.dot_general(
                        a, b, dims, preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                else:  # f32hi
                    a = vol._interval_onehot(xc, xe, nbx, jnp.float32)
                    b = vol._interval_onehot(yc, ye, nby, jnp.float32)
                    h = jax.lax.dot_general(
                        a, b, dims, precision=jax.lax.Precision.HIGHEST
                    ).astype(jnp.int32)
                return acc + h, None

            init = jnp.zeros((nbx, nby), dtype=jnp.int32)
            acc, _ = jax.lax.scan(step, init, (xs, ys))
            return acc

        return hist

    report = {"platform": jax.devices()[0].platform, "n": n, "nbins": [nbx, nby]}
    xe = jnp.asarray(xedges, dtype=jnp.float32)
    ye = jnp.asarray(yedges, dtype=jnp.float32)

    ref = None
    for mode in ("int8", "bf16", "f32hi"):
        fn = make_hist(mode)
        t0 = time.perf_counter()
        out = np.asarray(fn(dens, vx, xe, ye))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = np.asarray(fn(dens, vx, xe, ye))
        warm = (time.perf_counter() - t0) / reps
        if ref is None:
            ref = out
            match = True
        else:
            match = bool((out == ref).all())
        report[mode] = {"cold_s": cold, "warm_s": warm, "matches_int8": match}
        print(f"{mode}: cold {cold:.2f} s, warm {warm*1e3:.1f} ms, match={match}",
              flush=True)
    assert int(ref.sum()) <= dens.size

    # fused Pallas kernel (one-hots synthesized in VMEM, MXU contract)
    from fava_tpu.ops import pallas_pdf2d as pp

    try:
        fn = lambda: np.asarray(pp.pdf2d_counts(dens, vx, xedges, yedges))
        t0 = time.perf_counter()
        out = fn()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn()
        warm = (time.perf_counter() - t0) / reps
        match = bool((out == ref).all())
        report["pallas_fused"] = {"cold_s": cold, "warm_s": warm, "matches_int8": match}
        print(f"pallas: cold {cold:.2f} s, warm {warm*1e3:.1f} ms, match={match}",
              flush=True)
    except Exception as e:  # Mosaic may reject the dot/transpose form
        report["pallas_fused"] = {"error": repr(e)[:500]}
        print(f"pallas FAILED: {e!r}", flush=True)

    try:
        import jax.numpy as jnp2

        w = jnp.abs(vx) + 0.5
        wfn = lambda: np.asarray(pp.pdf2d_counts(dens, vx, xedges, yedges, weights=w))
        t0 = time.perf_counter()
        outw = wfn()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            outw = wfn()
        warm = (time.perf_counter() - t0) / reps
        # oracle: the XLA weighted path on the same draws
        ref_w = np.asarray(
            vol._hist2d_fn(nbx, nby, False)(dens, vx, w, xe, ye), dtype=np.float64
        )
        scale = np.abs(ref_w).max()
        err = float(np.abs(outw - ref_w).max() / scale)
        report["pallas_weighted"] = {"cold_s": cold, "warm_s": warm, "max_scaled_err_vs_xla": err}
        print(f"pallas weighted: cold {cold:.2f} s, warm {warm*1e3:.1f} ms, err={err:.2e}",
              flush=True)
    except Exception as e:
        report["pallas_weighted"] = {"error": repr(e)[:500]}
        print(f"pallas weighted FAILED: {e!r}", flush=True)

    # end-to-end pdf2d: fixed range (no minmax fetch) vs auto-range
    for tag, kw in (
        ("pdf2d_fixed", dict(xrange=(1.0, 2.0), yrange=(-2.0, 2.0))),
        ("pdf2d_auto", {}),
    ):
        f = partial(vol.pdf2d, dens, vx, nbins=(nbx, nby), **kw)
        f()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            f()
        warm = (time.perf_counter() - t0) / reps
        report[tag] = {"warm_s": warm}
        print(f"{tag}: warm {warm*1e3:.1f} ms", flush=True)

    (ROOT / "pdf2d_probe_512.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
