"""Sharding rules: logical axes -> mesh axes, parameter/batch placement.

The SURVEY §2.4 table's "mesh/runtime layer" partner: models annotate weights
with logical axis names (see models/layout_extractor.py); this module turns
those into `NamedSharding`s on the process mesh. One rule set covers:

  dp  — batch/page parallelism (pages are embarrassingly parallel)
  tp  — tensor parallelism for the extraction model's mlp/head dims

Collectives are inserted by XLA from these annotations — psum over `tp` for
row-sharded matmul outputs, all-gather where a replicated value is needed —
and ride ICI; nothing here issues communication by hand.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn
from flax.core import meta
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis -> mesh axis (None = replicate)
LOGICAL_RULES: tuple[tuple[str, str | None], ...] = (
    ("batch", "dp"),
    ("embed", None),
    ("mlp", "tp"),
    ("heads", "tp"),
    ("kv", None),
    ("vocab", None),
    ("tags", None),
    ("types", None),
    ("forms", None),
    ("one", None),
)


def logical_to_mesh_sharding(tree: Any, mesh: Mesh) -> Any:
    """Map a pytree of flax logical-partitioned metadata (from
    `nn.get_partition_spec` style trees or variables with axis metadata) to
    NamedShardings under `mesh`."""
    specs = nn.get_partition_spec(tree)
    specs = nn.logical_to_mesh(specs, rules=LOGICAL_RULES)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def unbox(tree: Any) -> Any:
    """Strip flax Partitioned boxes, leaving raw arrays."""
    return jax.tree.map(
        lambda x: x.unbox() if isinstance(x, meta.AxisMetadata) else x,
        tree,
        is_leaf=lambda x: isinstance(x, meta.AxisMetadata),
    )


def shard_params(variables: Any, mesh: Mesh) -> Any:
    """Device-put a variables pytree with its logical shardings (TP weights
    split over `tp`, everything else replicated)."""
    shardings = logical_to_mesh_sharding(variables, mesh)
    raw = unbox(variables)
    return jax.tree.map(jax.device_put, raw, shardings)


def batch_spec(ndim: int) -> P:
    """PartitionSpec sharding the leading batch dim over dp."""
    return P("dp", *([None] * (ndim - 1)))


def batch_sharding(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(
        lambda x: NamedSharding(mesh, batch_spec(x.ndim)), tree
    )


def replicated_sharding(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
