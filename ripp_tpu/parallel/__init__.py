"""Mesh-sharded execution: the multi-chip layer the reference never had
(its only substrate was rayon threads — SURVEY.md section 2.4)."""

from .mesh import SHARD_AXIS, data_mesh, replicated_spec, shard_spec, shard_tree
from .sipp import ShardedSIPP, from_cyclic, to_cyclic
from .reduce import (
    make_lean_miller_product,
    make_lean_msm,
    make_sharded_miller_product,
    make_sharded_msm,
    sharded_msm_host,
    sharded_multi_pairing,
)
from .vectors import ShardedFrVec, ShardedPointVec, sharded_ops

__all__ = [
    "SHARD_AXIS",
    "ShardedSIPP",
    "ShardedFrVec",
    "ShardedPointVec",
    "sharded_ops",
    "to_cyclic",
    "from_cyclic",
    "data_mesh",
    "replicated_spec",
    "shard_spec",
    "shard_tree",
    "make_lean_miller_product",
    "make_lean_msm",
    "make_sharded_miller_product",
    "make_sharded_msm",
    "sharded_msm_host",
    "sharded_multi_pairing",
]
