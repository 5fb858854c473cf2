"""Layout-aware field-extraction transformer (the local Gemini replacement).

The reference ships OCR markdown to Gemini 2.5 Flash Lite for key-value
extraction (gemini_service.py:235-364). The TPU-native replacement is a
LayoutLM-style encoder served on the same mesh as the OCR models:

  inputs:  token ids (char-level, models/charsets.py multilingual) +
           quantized box coordinates per token (0..1000, LayoutLM convention)
  outputs: per-token BIO tagging over {key, value} x field-type classes,
           plus a pooled form-type classification head

Tensor-parallel readiness: every weight is annotated with flax logical axes
('embed', 'mlp', 'heads', 'kv', 'vocab'); parallel/sharding.py maps logical
axes -> mesh axes so the same module runs replicated on one chip or
TP-sharded over `tp` without code changes. This is the §2.4 "tensor/operator
sharding for the VLM" component.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocr_system_tpu.core.dtypes import DTypePolicy, default_policy
from ocr_system_tpu.service.validation import FieldType

# BIO tag space: O + {B-,I-} x {key, value}. Field type is predicted
# separately per token so tag and type heads stay small and balanced.
TAGS = ("O", "B-KEY", "I-KEY", "B-VAL", "I-VAL")
NUM_TAGS = len(TAGS)
FIELD_TYPES = tuple(ft.value for ft in FieldType)
NUM_FIELD_TYPES = len(FIELD_TYPES)
FORM_TYPES = (
    "Unknown", "Invoice", "Receipt", "Application Form", "Medical Form",
    "Survey", "Purchase Order", "Tax Form", "Contract",
)
NUM_FORM_TYPES = len(FORM_TYPES)
COORD_BUCKETS = 1024  # quantized page coords 0..1023


def _dense(features, name, axes, policy, use_bias=True):
    return nn.Dense(
        features,
        name=name,
        use_bias=use_bias,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.xavier_uniform(), axes
        ),
        bias_init=nn.with_logical_partitioning(
            nn.initializers.zeros_init(), (axes[-1],)
        ),
    )


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    policy: DTypePolicy = default_policy()
    # sequence-parallel exact attention (parallel/ring_attention.py): K/V
    # blocks rotate the mesh's 'sp' ring via ppermute with online-softmax
    # accumulation, so documents longer than one chip's attention budget
    # still get IN-MODEL global attention (SURVEY §5.7's second tier; the
    # first tier is extract/layout_model.py's page-chunk map-reduce).
    # Requires seq_len % mesh.shape['sp'] == 0 — serving buckets are powers
    # of two, so any sp in {2,4,8,...} divides them.
    sequence_parallel: bool = False

    @nn.compact
    def __call__(self, x, mask):
        dt, pt = self.policy.compute_dtype, self.policy.param_dtype
        d, h = self.dim, self.heads
        hd = d // h

        y = nn.LayerNorm(dtype=dt, param_dtype=pt)(x)
        # fused QKV, head dim sharded over 'heads' (tp)
        qkv = _dense(3 * d, "qkv", ("embed", "heads"), self.policy)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t, _ = q.shape
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        if self.sequence_parallel:
            from ocr_system_tpu.core.mesh import get_mesh
            from ocr_system_tpu.parallel.ring_attention import ring_attention

            y = ring_attention(q, k, v, mask, get_mesh()).reshape(b, t, d)
        else:
            scale = hd**-0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            bias = jnp.where(
                mask[:, None, None, :], 0.0, -1e9
            ).astype(logits.dtype)
            attn = jax.nn.softmax(logits + bias, axis=-1)
            y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        y = _dense(d, "proj", ("heads", "embed"), self.policy)(y)
        x = x + y

        y = nn.LayerNorm(dtype=dt, param_dtype=pt)(x)
        y = _dense(d * self.mlp_ratio, "up", ("embed", "mlp"), self.policy)(y)
        y = nn.gelu(y)
        y = _dense(d, "down", ("mlp", "embed"), self.policy)(y)
        return x + y


class LayoutExtractor(nn.Module):
    vocab_size: int
    dim: int = 256
    depth: int = 6
    heads: int = 8
    max_len: int = 2048
    policy: DTypePolicy = default_policy()
    sequence_parallel: bool = False  # see Block.sequence_parallel

    @nn.compact
    def __call__(
        self, token_ids, boxes, mask, train: bool = False, pos_offset=None
    ):
        """token_ids: (B, L) int32; boxes: (B, L, 4) int32 in [0, 1024)
        (x0, y0, x1, y1 quantized); mask: (B, L) bool/int 1=valid.
        pos_offset: optional (B,) int32 — position-embedding window start per
        sample. Training slides random windows over the full max_len table so
        every serving position gets gradient even though training sequences
        are shorter than max_len; serving omits it (offset 0).

        Returns dict: tag_logits (B, L, NUM_TAGS), type_logits (B, L,
        NUM_FIELD_TYPES), form_logits (B, NUM_FORM_TYPES), confidence
        (B, L) in [0,1] (calibrated token confidence head).
        """
        dt, pt = self.policy.compute_dtype, self.policy.param_dtype
        mask = mask.astype(bool)

        embed = nn.Embed(
            self.vocab_size, self.dim, dtype=dt, param_dtype=pt,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
            name="tok_embed",
        )
        x = embed(token_ids)
        coord = nn.Embed(
            COORD_BUCKETS, self.dim, dtype=dt, param_dtype=pt,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
            name="coord_embed",
        )
        x = x + coord(boxes[..., 0]) + coord(boxes[..., 1])
        x = x + coord(boxes[..., 2]) + coord(boxes[..., 3])
        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(
                nn.initializers.normal(0.02), (None, None, "embed")
            ),
            (1, self.max_len, self.dim),
            pt,
        )
        if pos_offset is None:
            x = x + pos[:, : x.shape[1]].astype(dt)
        else:
            windows = jax.vmap(
                lambda off: jax.lax.dynamic_slice_in_dim(
                    pos[0], off, x.shape[1], axis=0
                )
            )(pos_offset)
            x = x + windows.astype(dt)

        for i in range(self.depth):
            x = Block(
                self.dim,
                self.heads,
                policy=self.policy,
                sequence_parallel=self.sequence_parallel,
                name=f"block{i}",
            )(x, mask)
        x = nn.LayerNorm(dtype=dt, param_dtype=pt)(x)

        tag_logits = _dense(NUM_TAGS, "tag_head", ("embed", "tags"), self.policy)(x)
        type_logits = _dense(
            NUM_FIELD_TYPES, "type_head", ("embed", "types"), self.policy
        )(x)
        conf = nn.sigmoid(
            _dense(1, "conf_head", ("embed", "one"), self.policy)(x)
        )[..., 0]

        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
        pooled = jnp.sum(x * mask[..., None], axis=1) / denom
        form_logits = _dense(
            NUM_FORM_TYPES, "form_head", ("embed", "forms"), self.policy
        )(pooled)

        return {
            "tag_logits": tag_logits.astype(jnp.float32),
            "type_logits": type_logits.astype(jnp.float32),
            "form_logits": form_logits.astype(jnp.float32),
            "confidence": conf.astype(jnp.float32),
        }


def extraction_loss(outputs, tags, types, form, mask):
    """Token-tag CE + token-type CE (on non-O tokens) + form CE.
    tags/types: (B, L) int32 labels; form: (B,) int32; mask: (B, L)."""
    mask = mask.astype(jnp.float32)

    def ce(logits, labels, m):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    tag_loss = ce(outputs["tag_logits"], tags, mask)
    typed_mask = mask * (tags > 0)
    type_loss = ce(outputs["type_logits"], types, typed_mask)
    logp = jax.nn.log_softmax(outputs["form_logits"], axis=-1)
    form_loss = -jnp.mean(jnp.take_along_axis(logp, form[:, None], axis=-1))
    return tag_loss + type_loss + 0.2 * form_loss
