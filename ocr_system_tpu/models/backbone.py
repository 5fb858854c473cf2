"""Convolutional backbone + FPN neck shared by the detection model.

TPU-first design choices:
  - NHWC layout (XLA's native conv layout on TPU), channels padded to
    MXU-friendly multiples where it matters.
  - Inverted-residual blocks (MobileNetV3-style, per PP-OCRv3/DBNet practice
    — PAPERS.md) but with ordinary convs instead of squeeze-excite's global
    pooling in early stages: SE's tiny matmuls underutilize the MXU, so SE is
    applied only in the last two stages.
  - All activations bf16 by policy; params f32 (core/dtypes.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ocr_system_tpu.core.dtypes import DTypePolicy, default_policy


class ConvBNAct(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    act: bool = True
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        if self.act:
            x = nn.hard_swish(x)
        return x


class SqueezeExcite(nn.Module):
    features: int
    ratio: int = 4
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.features // self.ratio, (1, 1),
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1),
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(s)
        return x * nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    features: int
    expand: int
    strides: tuple[int, int] = (1, 1)
    use_se: bool = False
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = ConvBNAct(self.expand, (1, 1), policy=self.policy)(x, train)
        h = ConvBNAct(
            self.expand, (3, 3), strides=self.strides, groups=self.expand,
            policy=self.policy,
        )(h, train)
        if self.use_se:
            h = SqueezeExcite(self.expand, policy=self.policy)(h)
        h = ConvBNAct(self.features, (1, 1), act=False, policy=self.policy)(h)
        if self.strides == (1, 1) and inp == self.features:
            h = h + x
        return h


class Backbone(nn.Module):
    """4-stage backbone producing features at strides 4, 8, 16, 32."""

    stage_features: Sequence[int] = (16, 24, 56, 120)
    stage_depths: Sequence[int] = (1, 2, 3, 3)
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.policy.cast_compute(x)
        x = ConvBNAct(16, (3, 3), strides=(2, 2), policy=self.policy)(x, train)
        feats = []
        for si, (f, d) in enumerate(zip(self.stage_features, self.stage_depths)):
            for bi in range(d):
                strides = (2, 2) if bi == 0 else (1, 1)
                x = InvertedResidual(
                    f, expand=f * 4, strides=strides, use_se=si >= 2,
                    policy=self.policy,
                )(x, train)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32


class FPNNeck(nn.Module):
    """Top-down FPN fusing the 4 stages to a single stride-4 map (DB neck)."""

    out_features: int = 96
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, feats, train: bool = False):
        lat = [
            ConvBNAct(self.out_features, (1, 1), policy=self.policy)(f, train)
            for f in feats
        ]
        # top-down: upsample by 2 and add
        for i in range(len(lat) - 2, -1, -1):
            up = jnp.repeat(jnp.repeat(lat[i + 1], 2, axis=1), 2, axis=2)
            up = up[:, : lat[i].shape[1], : lat[i].shape[2], :]
            lat[i] = lat[i] + up
        # smooth + bring all to stride 4 and concat
        outs = []
        for i, f in enumerate(lat):
            f = ConvBNAct(self.out_features // 4, (3, 3), policy=self.policy)(f, train)
            scale = 2**i
            if scale > 1:
                f = jnp.repeat(jnp.repeat(f, scale, axis=1), scale, axis=2)
                f = f[:, : lat[0].shape[1], : lat[0].shape[2], :]
            outs.append(f)
        return jnp.concatenate(outs, axis=-1)  # (B, H/4, W/4, out_features)
