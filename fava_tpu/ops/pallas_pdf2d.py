"""Fused joint-histogram (pdf2d) Pallas kernel.

The scatter-free pdf2d contracts interval one-hot matrices over the
sample axis on the MXU (ops/volume._hist2d_fn; the reference declares
pdf2d and never implements it — fava/analysis/pdf2d.py:6). The XLA
formulation is memory-bound: it MATERIALIZES the two (chunk, nbins)
one-hot operands in HBM (~27 GB written+read per 512^3 call, measured
~125 ms on-chip; pdf2d_probe_512.json shows int8/bf16/f32 dots all
identical — the dot is not the bottleneck, the operand traffic is).

This kernel never lets the one-hots exist outside VMEM: per grid step
it loads K samples of x and y as (1, K) lane rows, broadcasts them
against the 128-row edge columns to synthesize the (128, K) interval
one-hots in registers/VMEM, and contracts over the lane (sample) axis
on the MXU into a persistent (128, 128) accumulator:

    counts[i, j] = sum_s 1[xedges[i] <= x_s < xedges[i+1]]
                         * 1[yedges[j] <= y_s < yedges[j+1]]

HBM traffic: the two sample streams are read exactly ONCE (8 bytes per
sample vs ~200 in the XLA form). Exactness: one-hots are exact in
bf16 (0/1), each K-sample dot accumulates integers <= K < 2^24 in f32
(exact), and the cross-step accumulator is int32 — counts are EXACT
to 2^31 per bin, same contract as the XLA path. np.histogram bin
semantics (half-open intervals, last bin closed) are applied per edge
row inside the kernel against the host-exact np.linspace edges.

Constraints: nbins <= 128 per axis (default is (100, 100));
ops/volume.pdf2d falls back to the XLA path beyond that or off-TPU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_kernels as pk

LANE = pk.LANE

# Sample blocks are (8, _ROW): Mosaic requires sublane dims divisible
# by 8, so each grid step loads 8 sublane rows of _ROW samples and
# unrolls over them (pl.ds row reads — leading-dim slicing is
# unconstrained). The (128, _ROW) bf16 one-hot temporaries are ~2 MB
# each and are reused across the 8 rows.
_ROW = 8192
_K = 8 * _ROW  # samples per grid step


def _col(e_ref, k: int):
    """Column k of a (128, 128) VMEM ref as (128, 1) via masked sum
    (sub-128 lane slicing does not lower on TPU)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    return jnp.sum(jnp.where(lane == k, e_ref[...], 0.0), axis=1, keepdims=True)


def _onehot_bins(v_row, e_ref, nbins: int):
    """(128, K) bf16 interval one-hot of the (1, K) sample row against
    the edge columns in ``e_ref`` (col 0 = lower edges, col 1 = upper
    edges, rows past nbins are +inf sentinels that match nothing).
    np.histogram semantics: half-open bins, LAST bin closed."""
    lo = _col(e_ref, 0)
    hi = _col(e_ref, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (LANE, v_row.shape[1]), 0)
    last = row == (nbins - 1)
    m = (lo <= v_row) & ((v_row < hi) | (last & (v_row == hi)))
    return m.astype(jnp.bfloat16)


def _pdf2d_kernel(x_ref, y_ref, xe_ref, ye_ref, out_ref, *, nbx, nby):
    dims = (((1,), (1,)), ((), ()))  # contract the lane (sample) axis
    h = None
    for r in range(x_ref.shape[0]):
        a = _onehot_bins(x_ref[pl.ds(r, 1), :], xe_ref, nbx)  # (128, ROW)
        b = _onehot_bins(y_ref[pl.ds(r, 1), :], ye_ref, nby)
        hr = jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)
        h = hr if h is None else h + hr

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += h.astype(jnp.int32)


def _pdf2d_weighted_kernel(
    x_ref, y_ref, w_ref, xe_ref, ye_ref, out_ref, lo_ref, *, nbx, nby
):
    """Weighted joint histogram: fold w into the x one-hot via a
    three-term Dekker split (w == w1 + w2 + w3 exactly at f32
    precision; each wi is bf16, and bf16 * {0,1} products are exact),
    so three bf16 MXU passes reproduce the f32-weighted contraction —
    the in-kernel analog of Precision.HIGH, which Mosaic rejects as a
    dot attribute (see CLAUDE.md).

    The cross-step accumulator is DOUBLE-WORD (out_ref = hi plane,
    lo_ref = lo plane, combined in f64 on fetch): a plain f32
    accumulator stops absorbing h-sized increments once a bin passes
    2^24 * w (concentrated weighted bins at 512^3 — VERDICT r4 weak
    #5). Each grid step adds its chunk sum h with Knuth 2Sum (exact
    error word, a handful of VPU adds per (128, 128) plane); in-step
    accumulation is bounded by the 2^16-sample chunk (< 2^24)."""
    dims = (((1,), (1,)), ((), ()))
    h = None
    for r in range(x_ref.shape[0]):
        a = _onehot_bins(x_ref[pl.ds(r, 1), :], xe_ref, nbx)
        b = _onehot_bins(y_ref[pl.ds(r, 1), :], ye_ref, nby)
        w = w_ref[pl.ds(r, 1), :]  # (1, ROW) f32
        for _ in range(3):
            wi = w.astype(jnp.bfloat16)
            hi = jax.lax.dot_general(
                a * wi, b, dims, preferred_element_type=jnp.float32
            )
            h = hi if h is None else h + hi
            w = w - wi.astype(jnp.float32)  # exact residual (Dekker)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)

    acc = out_ref[...]
    s = acc + h
    bb = s - acc
    e = (acc - (s - bb)) + (h - bb)  # Knuth 2Sum error word (exact)
    out_ref[...] = s
    lo_ref[...] += e


def _edge_cols(edges: np.ndarray) -> np.ndarray:
    """(128, 128) f32 host constant: col 0 = lower edges, col 1 = upper
    edges, +inf sentinel rows beyond nbins (inf <= v is never true)."""
    e = np.full((LANE, LANE), np.inf, dtype=np.float32)
    nb = len(edges) - 1
    e[:nb, 0] = edges[:-1]
    e[:nb, 1] = edges[1:]
    return e


@lru_cache(maxsize=8)
def _build_pdf2d_fn(nbx: int, nby: int, interpret: bool, weighted: bool = False):
    if weighted:
        kernel = lambda *refs: _pdf2d_weighted_kernel(*refs, nbx=nbx, nby=nby)
        out_dtype = jnp.float32
    else:
        kernel = lambda *refs: _pdf2d_kernel(*refs, nbx=nbx, nby=nby)
        out_dtype = jnp.int32

    def run(x, y, *rest):
        n = x.shape[0]
        steps = n // _K
        samp = pl.BlockSpec((8, _ROW), lambda i: (i, 0))
        edge = pl.BlockSpec((LANE, LANE), lambda i: (0, 0))
        acc = pl.BlockSpec((LANE, LANE), lambda i: (0, 0))
        nsamp = 3 if weighted else 2
        args = [v.reshape(steps * 8, _ROW) for v in (x, y, *rest[: nsamp - 2])]
        if weighted:
            out_specs = [acc, acc]
            out_shape = [jax.ShapeDtypeStruct((LANE, LANE), out_dtype)] * 2
        else:
            out_specs = acc
            out_shape = jax.ShapeDtypeStruct((LANE, LANE), out_dtype)
        out = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[samp] * nsamp + [edge, edge],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*args, *rest[nsamp - 2 :])
        if weighted:
            # (2, nbx, nby): hi plane + 2Sum error plane, f64-combined
            # by the caller
            return jnp.stack([out[0][:nbx, :nby], out[1][:nbx, :nby]])
        return out[:nbx, :nby]

    return jax.jit(run)


def _cols_from_edges(e1d: jax.Array) -> jax.Array:
    """TRACED (128, 128) edge-column matrix from a 1D edges array —
    the in-jit analog of :func:`_edge_cols` for data-dependent ranges
    (fused Q-R invariant path, where the edges scale with an on-device
    Q_w). Same layout: col 0 = lower, col 1 = upper, +inf sentinels
    past nbins; edge VALUES are f32-rounded here (the host path rounds
    f64 linspace edges to f32 — at most a one-ulp bin-boundary shift,
    the same class as VALIDATION's pdf2d bin-edge note)."""
    nb = e1d.shape[0] - 1
    lo = jnp.full((LANE,), jnp.inf, dtype=jnp.float32).at[:nb].set(
        e1d[:-1].astype(jnp.float32)
    )
    hi = jnp.full((LANE,), jnp.inf, dtype=jnp.float32).at[:nb].set(
        e1d[1:].astype(jnp.float32)
    )
    e = jnp.full((LANE, LANE), jnp.inf, dtype=jnp.float32)
    return e.at[:, 0].set(lo).at[:, 1].set(hi)


def pdf2d_counts_traced(x, y, xedges: jax.Array, yedges: jax.Array):
    """In-trace variant of :func:`pdf2d_counts` (unweighted): edges are
    TRACED 1D arrays, so a caller's jit can fuse data-dependent ranges
    (e.g. Q_w-normalized invariant bins) with the histogram — no host
    round trip between the range reduction and the binning. Same exact
    int32 counts contract."""
    nbx = int(xedges.shape[0]) - 1
    nby = int(yedges.shape[0]) - 1
    xf = x.ravel().astype(jnp.float32)
    yf = y.ravel().astype(jnp.float32)
    npad = (-xf.shape[0]) % _K
    if npad:
        fill = jnp.full((npad,), jnp.inf, dtype=jnp.float32)
        xf = jnp.concatenate([xf, fill])
        yf = jnp.concatenate([yf, fill])
    fn = _build_pdf2d_fn(nbx, nby, pk.FORCE_INTERPRET, weighted=False)
    return fn(xf, yf, _cols_from_edges(xedges), _cols_from_edges(yedges))


def pdf2d_counts_ok(nbx: int, nby: int) -> bool:
    """Kernel-path legality: on TPU (or interpret), both bin counts fit
    the 128-row edge columns. Any sample count is legal (ragged tails
    are inf-padded; empty inputs are handled by the caller)."""
    return (pk.on_tpu() or pk.FORCE_INTERPRET) and nbx <= LANE and nby <= LANE


def pdf2d_counts(x, y, xedges: np.ndarray, yedges: np.ndarray, weights=None):
    """Joint histogram of flat sample arrays via the fused kernel:
    int32 exact counts (nbx, nby), or weighted double-word sums
    (2, nbx, nby) — hi and lo planes the caller combines in f64 (exact
    f32 weight products via the in-kernel Dekker split; cross-step
    2Sum accumulation, no f32 2^24 stall). Pads ragged tails with +inf
    on device (lands in no bin; pad weights are zero)."""
    nbx = len(xedges) - 1
    nby = len(yedges) - 1
    xf = x.ravel().astype(jnp.float32)
    yf = y.ravel().astype(jnp.float32)
    args = []
    if weights is not None:
        args.append(weights.ravel().astype(jnp.float32))
    npad = (-xf.shape[0]) % _K
    if npad:
        fill = jnp.full((npad,), jnp.inf, dtype=jnp.float32)
        xf = jnp.concatenate([xf, fill])
        yf = jnp.concatenate([yf, fill])
        args = [jnp.concatenate([w, jnp.zeros((npad,), dtype=jnp.float32)]) for w in args]
    fn = _build_pdf2d_fn(nbx, nby, pk.FORCE_INTERPRET, weighted=weights is not None)
    return fn(
        xf,
        yf,
        *args,
        jnp.asarray(_edge_cols(np.asarray(xedges, dtype=np.float64))),
        jnp.asarray(_edge_cols(np.asarray(yedges, dtype=np.float64))),
    )
