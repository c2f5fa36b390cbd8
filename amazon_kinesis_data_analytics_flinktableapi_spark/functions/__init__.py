"""Scalar / text / vector function library (registration facade included)."""
