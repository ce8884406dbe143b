"""Scalar/array function library (SURVEY §2.7-§2.8)."""
