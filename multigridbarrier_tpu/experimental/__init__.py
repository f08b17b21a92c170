"""Measured-REJECTED machinery, quarantined.

Everything in this package was built for a hypothesis that controlled
measurement then falsified; it is kept (tested) so the negative result
stays reproducible, but nothing here is a production code path.  See
options.py KNOBS entries of kind "experimental" for the rejection records.

Current contents:
  ozmm.py — Ozaki-scheme f64 matmul emulation via bf16 MXU slices.
    Built for the ND factor's f64 matmuls; session-8/9 measurement showed
    the factor is f64-EMULATION-bound in XLA's scalar ops, not matmul
    flops, so a faster f64 matmul buys nothing (CLAUDE.md round-2).
"""
