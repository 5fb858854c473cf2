"""Pipeline parallelism (GPipe microbatch schedule) on the CPU mesh.

Checks the SPMD pipeline in parallel/pipeline.py against the serial stage
stack: forward equivalence, gradient equivalence (the pp TRAIN step is
grad-through-the-schedule — ppermute's transpose gives the reverse hops),
and a real-model smoke with stacked LayoutExtractor-style MLP blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_system_tpu.core.mesh import build_mesh
from ocr_system_tpu.parallel.pipeline import (
    pipeline_apply,
    serial_reference,
    stack_stage_params,
)


@pytest.fixture(scope="module")
def mesh():
    return build_mesh("pp=4")


def _stage_fn(params, x):
    # a residual MLP stage, shape-preserving like a transformer block
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


def _stage_params(seed, d, hidden):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "w1": jax.random.normal(k1, (d, hidden), jnp.float32) * 0.3,
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jax.random.normal(k2, (hidden, d), jnp.float32) * 0.3,
    }


class TestPipelineForward:
    def test_matches_serial(self, mesh):
        d, hidden, n_micro, mb = 16, 32, 8, 4
        stages = [_stage_params(i, d, hidden) for i in range(4)]
        x = jax.random.normal(jax.random.PRNGKey(9), (n_micro, mb, d))
        out = pipeline_apply(_stage_fn, stack_stage_params(stages), x, mesh)
        ref = serial_reference(_stage_fn, stages, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

    def test_micro_equals_pipe_depth(self, mesh):
        # the minimum sensible schedule: n_micro == P
        d, hidden = 8, 16
        stages = [_stage_params(10 + i, d, hidden) for i in range(4)]
        x = jax.random.normal(jax.random.PRNGKey(11), (4, 2, d))
        out = pipeline_apply(_stage_fn, stack_stage_params(stages), x, mesh)
        ref = serial_reference(_stage_fn, stages, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )


class TestPipelineGrad:
    def test_grad_matches_serial(self, mesh):
        """Training through the pipeline: grads w.r.t. every stage's params
        must equal the serial stack's grads (GPipe backward for free)."""
        d, hidden, n_micro, mb = 8, 12, 8, 2
        stages = [_stage_params(20 + i, d, hidden) for i in range(4)]
        stacked = stack_stage_params(stages)
        x = jax.random.normal(jax.random.PRNGKey(21), (n_micro, mb, d))
        tgt = jax.random.normal(jax.random.PRNGKey(22), (n_micro, mb, d))

        def pipe_loss(p):
            return jnp.mean((pipeline_apply(_stage_fn, p, x, mesh) - tgt) ** 2)

        def serial_loss(ps):
            return jnp.mean((serial_reference(_stage_fn, ps, x) - tgt) ** 2)

        g_pipe = jax.grad(pipe_loss)(stacked)
        g_ser = stack_stage_params(
            list(jax.grad(serial_loss)(stages))
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            ),
            g_pipe,
            g_ser,
        )
