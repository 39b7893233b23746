"""Measured-negative experiments, fenced off from the production package.

Every module here is a fully working, tested implementation that LOST
(or washed) against the production path in on-TPU measurement — kept
with its numbers so future tuning starts from evidence instead of
re-deriving it (docs/perf.md "negative results" section). Nothing in
``fava_tpu.ops``/``fava_tpu.analysis`` imports from this package;
importing an experiment is the explicit opt-in.

Contents:
  pallas_dft  — fused z+y dense-DFT Pallas kernel
                (88.7 vs 67.0 ms at 512^3, fused_zy_512.json)
  planar_dft  — stacked planar re/im in-core transform pipeline, with
                the optional Karatsuba 3-mult complex axes
                (116 vs 113 ms; Karatsuba 108.3 vs 95.3 ms,
                karatsuba_512.json). Planar *streaming* remains
                production in ops/outofcore.py where complex-extraction
                temps are the real constraint.
"""
