"""Reusable operator implementations (as-of join, dedup, similarity,
text analysis, ...) composed from DataFrame primitives.

Queries in ``queries/`` are thin wrappers over these so the same
implementations serve the harness contract, the pytest suite, and any
downstream user of the package.
"""
