"""DBNet text detection model (Differentiable Binarization).

Replaces the detection stage the reference outsources (Azure prebuilt-layout,
ocr_service.py:213-246; PP-DocLayoutV2 in the PaddleOCR backup,
ocr_service_paddleocr_backup.py:204-253) with a local model:

  backbone -> FPN -> prob head (+ thresh head when training) -> shrink map

Following Liao et al. (PAPERS.md "Real-time Scene Text Detection with
Differentiable Binarization"): at train time the binary map is
b = sigmoid(k * (P - T)) with k=50; at inference only the probability map is
needed — box extraction happens in ops/boxes.py on host.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ocr_system_tpu.core.dtypes import DTypePolicy, default_policy
from ocr_system_tpu.models.backbone import Backbone, ConvBNAct, FPNNeck


class _Head(nn.Module):
    """Prob/thresh head: conv -> 2x deconv to full resolution -> sigmoid."""

    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = x.shape[-1]
        x = ConvBNAct(f // 4, (3, 3), policy=self.policy)(x, train)
        x = nn.ConvTranspose(
            f // 4, (2, 2), strides=(2, 2),
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(
            1, (2, 2), strides=(2, 2),
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))[..., 0]  # (B, H, W)


class DBNet(nn.Module):
    """Input: (B, H, W, 3) normalized images, H, W multiples of 32.
    Output: dict with 'prob' (B, H, W); plus 'thresh'/'binary' when train."""

    neck_features: int = 96
    policy: DTypePolicy = default_policy()
    k: float = 50.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = Backbone(policy=self.policy)(x, train)
        fused = FPNNeck(self.neck_features, policy=self.policy)(feats, train)
        prob = _Head(policy=self.policy, name="prob_head")(fused, train)
        out = {"prob": prob}
        if train:
            thresh = _Head(policy=self.policy, name="thresh_head")(fused, train)
            out["thresh"] = thresh
            out["binary"] = nn.sigmoid(self.k * (prob - thresh))
        return out


def db_loss(outputs, gt_shrink, gt_shrink_mask, gt_thresh, gt_thresh_mask):
    """DB training loss: BCE(prob) + L1(thresh) + dice(binary), weights 1/10/5
    per the paper. All inputs (B, H, W) float32."""
    eps = 1e-6
    prob, thresh, binary = outputs["prob"], outputs["thresh"], outputs["binary"]

    # balanced BCE on the shrink map (3:1 negative:positive hard mining is
    # replaced by plain masking + normalization — stable under jit)
    bce = -(
        gt_shrink * jnp.log(prob + eps) + (1 - gt_shrink) * jnp.log(1 - prob + eps)
    )
    bce = jnp.sum(bce * gt_shrink_mask) / (jnp.sum(gt_shrink_mask) + eps)

    l1 = jnp.sum(jnp.abs(thresh - gt_thresh) * gt_thresh_mask) / (
        jnp.sum(gt_thresh_mask) + eps
    )

    inter = jnp.sum(binary * gt_shrink * gt_shrink_mask)
    union = jnp.sum(binary * gt_shrink_mask) + jnp.sum(gt_shrink * gt_shrink_mask)
    dice = 1.0 - 2.0 * inter / (union + eps)

    return bce + 10.0 * l1 + 5.0 * dice
