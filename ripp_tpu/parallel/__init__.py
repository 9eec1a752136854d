"""Mesh-sharded execution: the multi-chip layer the reference never had
(its only substrate was rayon threads — SURVEY.md section 2.4)."""

from .mesh import SHARD_AXIS, data_mesh, replicated_spec, shard_spec, shard_tree
from .sipp import ShardedSIPP, from_cyclic, to_cyclic
from .reduce import (
    make_sharded_miller_product,
    make_sharded_msm,
    sharded_msm_host,
    sharded_multi_pairing,
)

__all__ = [
    "SHARD_AXIS",
    "ShardedSIPP",
    "to_cyclic",
    "from_cyclic",
    "data_mesh",
    "replicated_spec",
    "shard_spec",
    "shard_tree",
    "make_sharded_miller_product",
    "make_sharded_msm",
    "sharded_msm_host",
    "sharded_multi_pairing",
]
