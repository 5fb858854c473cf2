"""Device mesh & topology — the framework's "communication backend".

The reference has no distributed layer at all (SURVEY.md §2.4: a
`Semaphore(1)` serializes OCR; the only comm is HTTPS to Azure/Gemini).
The TPU rebuild replaces that with a single module that owns device topology:
a `jax.sharding.Mesh` whose axes are

    dp — data parallel: pages are embarrassingly parallel, so page batches
         shard over dp (replaces the reference's per-page serial loop,
         ocr_service.py:620-627);
    tp — tensor parallel: the layout-extraction model's feed-forward / head
         dimensions shard over tp (replaces the hosted Gemini call).

Collectives (psum/all_gather/reduce_scatter) are inserted by XLA from
sharding annotations and ride ICI — there is no NCCL/MPI analog to manage.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
import os
import threading
from typing import Iterator, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
TENSOR_AXIS = "tp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh shape spec. Sizes of -1 are filled with the remaining devices."""

    axes: tuple[tuple[str, int], ...] = ((DATA_AXIS, -1),)

    @classmethod
    def from_string(cls, spec: str) -> "MeshConfig":
        axes = []
        for part in spec.split(","):
            part = part.strip()
            if not part:
                continue
            name, _, size = part.partition("=")
            axes.append((name.strip(), int(size)))
        return cls(axes=tuple(axes) or ((DATA_AXIS, -1),))

    def resolve(self, n_devices: int) -> tuple[tuple[str, int], ...]:
        fixed = math.prod(s for _, s in self.axes if s != -1)
        unknowns = [name for name, s in self.axes if s == -1]
        if len(unknowns) > 1:
            raise ValueError(f"at most one -1 axis allowed, got {unknowns}")
        if n_devices % max(fixed, 1) != 0:
            raise ValueError(
                f"{n_devices} devices not divisible by fixed axes product {fixed}"
            )
        fill = n_devices // fixed if unknowns else None
        return tuple(
            (name, fill if s == -1 else s) for name, s in self.axes  # type: ignore[misc]
        )


def build_mesh(
    config: MeshConfig | str | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh over the given (default: all) devices.

    Axis order follows the config; dp is outermost so page-batch sharding
    maps to the slowest-varying device dimension (keeps tp groups on
    directly-connected neighbors where ICI bandwidth is highest).
    """
    if isinstance(config, str):
        config = MeshConfig.from_string(config)
    if config is None:
        config = MeshConfig()
    devs = list(devices if devices is not None else jax.devices())
    axes = config.resolve(len(devs))
    names = tuple(name for name, _ in axes)
    sizes = tuple(size for _, size in axes)
    total = math.prod(sizes)
    # all-fixed axes may use a subset of devices (e.g. sp=4 of 8)
    dev_array = np.asarray(devs[:total]).reshape(sizes)
    return Mesh(dev_array, names)


_local = threading.local()


def get_mesh() -> Mesh:
    """Process-wide mesh singleton, built lazily from Settings.mesh_shape
    (or MESH_SHAPE env). Mirrors the reference's lazy singleton services
    (ocr_service.py:126-160) but for topology."""
    mesh = getattr(_local, "mesh", None)
    if mesh is None:
        spec = os.environ.get("MESH_SHAPE")
        if spec is None:
            from ocr_system_tpu.core.config import get_settings

            spec = get_settings().mesh_shape
        mesh = build_mesh(spec)
        _local.mesh = mesh
    return mesh


def set_mesh(mesh: Mesh | None) -> None:
    _local.mesh = mesh


@contextlib.contextmanager
def mesh_context(mesh: Mesh) -> Iterator[Mesh]:
    prev = getattr(_local, "mesh", None)
    _local.mesh = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _local.mesh = prev


# ---- sharding helpers ----


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) dim over dp, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batch-leading arrays with dp sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
