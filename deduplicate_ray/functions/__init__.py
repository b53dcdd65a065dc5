"""Scalar / per-batch functions: hashing, path projections, text analysis."""
