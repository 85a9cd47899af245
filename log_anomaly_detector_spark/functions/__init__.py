"""Scalar-function helpers shared by operator packs."""
