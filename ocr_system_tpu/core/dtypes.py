"""Dtype policy: bf16 compute on the MXU, f32 params/accumulation.

The reference has no dtype policy (all compute is remote); this is the
TPU-native replacement — one place that decides which dtype flows through
matmuls versus which is stored, so every model takes a `DTypePolicy` instead
of hard-coding dtypes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    @classmethod
    def from_names(cls, compute: str, param: str = "float32") -> "DTypePolicy":
        return cls(
            compute_dtype=jnp.dtype(compute),
            param_dtype=jnp.dtype(param),
        )


def default_policy() -> DTypePolicy:
    return DTypePolicy()
