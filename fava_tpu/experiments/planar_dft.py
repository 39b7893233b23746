"""Stacked planar in-core rfftn pipeline (measured-negative experiment).

A fully planar re/im transform of the three velocity volumes — no
complex dtype anywhere, so XLA never materializes re/im extraction
temps. This is the input format of the fused powers+binning kernel
(``ops.pallas_kernels.shell_bin_powers_fused``). In-core it measured
SLOWER than XLA's own complex decomposition (116 vs 113 ms end-to-end
at 512^3; Karatsuba variant 108.3 vs 95.3 ms — karatsuba_512.json):
XLA fuses the four-real-einsum complex algebra better than the hand
pipeline. Planar streaming stays production in ops/outofcore.py, where
the temps ARE the memory constraint.

Reference counterpart: np.fft.fftn per rank
(reference: fava/mesh/FLASH/FlashUniform.py:266-273).
"""

from __future__ import annotations

import jax.numpy as jnp

from fava_tpu.ops.dft import PRECISION, _dft_mat, _rdft_mats, planar_complex_matmul


def rfftn_mxu_planar_stacked(vols, precision=None, karatsuba: bool = False):
    """Stacked PLANAR transforms of three real volumes: ((3, nx, ny,
    nz//2+1) re, same im).

    ``karatsuba`` applies each complex axis with THREE real einsums
    instead of four (t1 = Wr@re, t2 = Wi@im, t3 = (Wr+Wi)@(re+im);
    re' = t1-t2, im' = t3-t1-t2) — 25% fewer MXU flops on the y/x
    axes at the cost of one elementwise add pass and slightly larger
    rounding (sums before products).
    """
    precision = PRECISION if precision is None else precision
    x = jnp.stack(vols)  # (3, nx, ny, nz)
    n = x.shape[-1]
    cr, ci = _rdft_mats(n, x.dtype.name)
    re = jnp.einsum("...z,zk->...k", x, cr, precision=precision)
    im = jnp.einsum("...z,zk->...k", x, ci, precision=precision)
    specs = {2: "ab,cxbz->cxaz", 1: "ab,cbyz->cayz"}
    for axis in (2, 1):  # y then x of the (comp, x, y, kz) layout
        d = _dft_mat(x.shape[axis], x.dtype.name)
        re, im = planar_complex_matmul(
            specs[axis],
            jnp.asarray(d.real.copy()),
            jnp.asarray(d.imag.copy()),
            re,
            im,
            precision=precision,
            karatsuba=karatsuba,
        )
    return re, im
