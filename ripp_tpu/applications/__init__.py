"""Applications (reference L4): Groth16 aggregation + polynomial
commitments (trusted & transparent two-tier schemes)."""

from . import groth16, groth16_aggregation, kzg, poly_commit
from . import poly_commit_transparent

__all__ = [
    "groth16",
    "groth16_aggregation",
    "kzg",
    "poly_commit",
    "poly_commit_transparent",
]
