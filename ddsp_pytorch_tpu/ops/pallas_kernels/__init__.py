"""Pallas TPU kernels for the DSP hot path.

These fuse the ops XLA cannot (profitably) fuse on its own — chiefly the
harmonic oscillator bank, whose (B, T, K) sin matrix must never be
materialized in HBM (the reference's main memory hog, SURVEY.md §3.1).
Each kernel has a pure-XLA twin in ops/ used as the numerical oracle.
"""
