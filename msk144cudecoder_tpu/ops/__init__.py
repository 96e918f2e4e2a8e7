"""JAX/XLA compute ops: analytic conversion, scan, demod, LDPC, pipeline."""

from . import analytic, ldpc, pipeline, scan, softbits  # noqa: F401
