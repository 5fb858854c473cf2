"""Ring attention: sequence-parallel exact attention over the mesh.

SURVEY.md §5.7: the reference concatenates whole documents into one Gemini
prompt; the local replacement must attend over (pages x tokens) streams that
exceed one chip's memory. This module implements blockwise ring attention
(Liu et al.'s Ring Attention formulation) the XLA-native way: `shard_map`
over a sequence axis, K/V blocks rotating around the ring with
`jax.lax.ppermute` (lowered onto ICI), online-softmax accumulation so the
full attention matrix never materializes.

Exactness: results match full attention up to float error for any sequence
length divisible by the ring size (tests/test_ring_attention.py checks
against the dense reference on the 8-device CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

SEQ_AXIS = "sp"


def _online_block(carry, kv, q, scale, mask_value=-1e30):
    """One online-softmax accumulation step.

    carry: (acc (B,Tq,H,D), row_max (B,H,Tq), row_sum (B,H,Tq))
    kv:    (k_blk (B,Tk,H,D), v_blk (B,Tk,H,D), valid (B,Tk))
    """
    acc, row_max, row_sum = carry
    k_blk, v_blk, valid = kv
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk) * scale
    logits = jnp.where(valid[:, None, None, :], logits, mask_value)
    blk_max = jnp.max(logits, axis=-1)  # (B,H,Tq)
    new_max = jnp.maximum(row_max, blk_max)
    correction = jnp.exp(row_max - new_max)
    p = jnp.exp(logits - new_max[..., None])  # (B,H,Tq,Tk)
    blk_sum = jnp.sum(p, axis=-1)
    new_sum = row_sum * correction + blk_sum
    pv = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk)
    new_acc = acc * correction.transpose(0, 2, 1)[..., None] + pv
    return new_acc, new_max, new_sum


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = SEQ_AXIS,
) -> jnp.ndarray:
    """Exact attention with sequence sharded over `axis`.

    q, k, v: (B, T, H, D) with T divisible by mesh.shape[axis];
    mask: (B, T) 1=valid. Returns (B, T, H, D), sharded like q.

    Each device holds T/n of the sequence; K/V blocks travel the ring via
    ppermute while the local Q accumulates online-softmax partials — n-1
    hops, each overlapping compute with the next transfer (XLA schedules
    the collective-permute concurrently with the einsum chain).
    """
    n = mesh.shape[axis]
    scale = q.shape[-1] ** -0.5

    def local(q_blk, k_blk, v_blk, m_blk):
        b, tq, h, d = q_blk.shape

        acc = jnp.zeros_like(q_blk)
        row_max = jnp.full((b, h, tq), -jnp.inf, q_blk.dtype)
        row_sum = jnp.zeros((b, h, tq), q_blk.dtype)
        carry = (acc, row_max, row_sum)

        def body(i, state):
            carry, k_cur, v_cur, m_cur = state
            carry = _online_block(carry, (k_cur, v_cur, m_cur), q_blk, scale)
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            m_nxt = jax.lax.ppermute(m_cur, axis, perm)
            return carry, k_nxt, v_nxt, m_nxt

        carry, _, _, _ = jax.lax.fori_loop(
            0, n, body, (carry, k_blk, v_blk, m_blk)
        )
        acc, _, row_sum = carry
        denom = jnp.maximum(row_sum, 1e-30).transpose(0, 2, 1)[..., None]
        return acc / denom

    spec = P(None, axis, None, None)
    mspec = P(None, axis)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
        check_rep=False,
    )(q, k, v, mask)


def dense_attention_reference(q, k, v, mask):
    """Dense reference for tests."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def chunked_extract_merge(chunk_results: list) -> "object":
    """The pragmatic first tier for long documents (SURVEY §5.7): per-chunk
    extraction results map-reduced into one ExtractionResult. Earlier chunks
    win key conflicts (reading order); confidences carry through."""
    from ocr_system_tpu.extract.types import ExtractionResult

    merged = ExtractionResult()
    seen: set[tuple[str, str]] = set()
    for r in chunk_results:
        if not r.success:
            continue
        for f in r.fields:
            key = f.field_key.strip().lower()
            # keyed fields dedup by key (earlier chunk wins); orphan values
            # (empty key) dedup by value — chunk OVERLAP re-decodes the tail
            # of each chunk, which would otherwise duplicate them
            sig = (key, "" if key else f.field_value.strip().lower())
            if sig in seen:
                continue
            seen.add(sig)
            merged.fields.append(f)
        merged.token_count += r.token_count
        merged.processing_time_ms += r.processing_time_ms
        if merged.form_type == "Unknown" and r.form_type != "Unknown":
            merged.form_type = r.form_type
        if merged.language == "en" and r.language != "en":
            merged.language = r.language
    merged.success = bool(chunk_results) and any(r.success for r in chunk_results)
    return merged
