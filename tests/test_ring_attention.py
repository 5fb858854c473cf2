"""Ring attention correctness on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_system_tpu.core.mesh import build_mesh
from ocr_system_tpu.extract.types import ExtractedField, ExtractionResult
from ocr_system_tpu.parallel.ring_attention import (
    chunked_extract_merge,
    dense_attention_reference,
    ring_attention,
)


@pytest.fixture(scope="module")
def mesh():
    return build_mesh("sp=4")


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


class TestRingAttention:
    def test_matches_dense(self, mesh):
        b, t, h, d = 2, 32, 4, 16
        q, k, v = _rand((b, t, h, d), 0), _rand((b, t, h, d), 1), _rand((b, t, h, d), 2)
        mask = jnp.ones((b, t), jnp.int32)
        out = ring_attention(q, k, v, mask, mesh)
        ref = dense_attention_reference(q, k, v, mask.astype(bool))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_respects_mask(self, mesh):
        b, t, h, d = 1, 16, 2, 8
        q, k, v = _rand((b, t, h, d), 3), _rand((b, t, h, d), 4), _rand((b, t, h, d), 5)
        mask = jnp.array([[1] * 10 + [0] * 6], jnp.int32)
        out = ring_attention(q, k, v, mask, mesh)
        ref = dense_attention_reference(q, k, v, mask.astype(bool))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_jittable(self, mesh):
        b, t, h, d = 1, 16, 2, 8
        q = _rand((b, t, h, d), 6)
        mask = jnp.ones((b, t), jnp.int32)
        f = jax.jit(lambda q: ring_attention(q, q, q, mask, mesh))
        out = f(q)
        assert out.shape == q.shape


class TestChunkedMerge:
    def _res(self, fields, success=True):
        return ExtractionResult(
            fields=[ExtractedField(k, v) for k, v in fields],
            success=success,
            token_count=10,
        )

    def test_merge_dedups_earlier_wins(self):
        a = self._res([("Name", "John"), ("Date", "1/1")])
        b = self._res([("Name", "WRONG"), ("Total", "$5")])
        merged = chunked_extract_merge([a, b])
        got = {f.field_key: f.field_value for f in merged.fields}
        assert got == {"Name": "John", "Date": "1/1", "Total": "$5"}
        assert merged.token_count == 20

    def test_failed_chunks_skipped(self):
        ok = self._res([("A", "1")])
        bad = self._res([("B", "2")], success=False)
        merged = chunked_extract_merge([ok, bad])
        assert [f.field_key for f in merged.fields] == ["A"]
        assert merged.success

    def test_empty(self):
        merged = chunked_extract_merge([])
        assert not merged.success
