"""Scalar/vector function library (hashing, text, arrays)."""
