"""SVTR-style text-line recognizer with a CTC head.

Replaces the recognition stage the reference outsources (Azure word
recognition / PaddleOCR-VL's SVTR recognizer — SURVEY.md §2.3). Architecture
follows PP-OCRv3's SVTR direction (PAPERS.md): a conv stem that collapses
height, then transformer mixer blocks over the width axis, then a CTC
projection. Transformer blocks are pure matmuls + softmax — exactly what the
MXU wants; no recurrence (CRNN's LSTM serializes on TPU).

Input crops are (B, H=48, W, 3) with W in static buckets
(Settings.rec_width_buckets); the time axis is W/4 after the stem.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocr_system_tpu.core.dtypes import DTypePolicy, default_policy
from ocr_system_tpu.models.backbone import ConvBNAct


class MixerBlock(nn.Module):
    dim: int
    heads: int = 4
    mlp_ratio: int = 4
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, T, D); mask: (B, T) 1=valid
        dt, pt = self.policy.compute_dtype, self.policy.param_dtype
        h = nn.LayerNorm(dtype=dt, param_dtype=pt)(x)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :].astype(bool)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=dt, param_dtype=pt
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(dtype=dt, param_dtype=pt)(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=dt, param_dtype=pt)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=dt, param_dtype=pt)(h)
        return x + h


class SVTRRecognizer(nn.Module):
    vocab_size: int
    dim: int = 192
    depth: int = 6
    heads: int = 6
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x, widths=None, train: bool = False):
        """x: (B, 48, W, 3); widths: (B,) valid pixel widths (<= W).
        Returns (logits (B, T, V), logit_lengths (B,)) with T = W // 4."""
        dt, pt = self.policy.compute_dtype, self.policy.param_dtype
        x = self.policy.cast_compute(x)
        w_in = x.shape[2]

        # Stem: 3 conv stages; height 48 -> 6, width W -> W/4.
        x = ConvBNAct(self.dim // 4, (3, 3), strides=(2, 2), policy=self.policy)(x, train)
        x = ConvBNAct(self.dim // 2, (3, 3), strides=(2, 2), policy=self.policy)(x, train)
        x = ConvBNAct(self.dim, (3, 3), strides=(2, 1), policy=self.policy)(x, train)
        # collapse height: (B, 6, W/4, D) -> (B, W/4, D)
        x = jnp.mean(x, axis=1)
        t = x.shape[1]

        if widths is None:
            lengths = jnp.full((x.shape[0],), t, jnp.int32)
        else:
            lengths = jnp.ceil(widths.astype(jnp.float32) / (w_in / t)).astype(jnp.int32)
            lengths = jnp.clip(lengths, 1, t)
        steps = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], t), 1)
        mask = (steps < lengths[:, None]).astype(dt)

        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 512, self.dim),
            pt,
        )
        x = x + pos[:, :t].astype(dt)
        for _ in range(self.depth):
            x = MixerBlock(self.dim, self.heads, policy=self.policy)(x, mask)
        x = nn.LayerNorm(dtype=dt, param_dtype=pt)(x)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, param_dtype=pt)(x)
        return logits, lengths
