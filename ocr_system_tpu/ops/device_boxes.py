"""On-device detection box statistics: prob map -> per-component stats, in-jit.

The det stage's largest wire item is the probability-map fetch (100-400 ms
per 8-page wave depending on tunnel weather, even 4-bit packed — PERF.md
"The wire"). The host only needs the map to run connected components and
per-component statistics; the boxes themselves are ~20 KB. This module
computes those statistics ON DEVICE so the det forward can return a tiny
(B, K, 7) stats tensor instead and the full map never crosses the wire on
the fast path (VERDICT r4 next-step 1(c): "emit boxes on-device ... shrink
the prob-map fetch to box lists").

Connected components the XLA way (no data-dependent loops on host):
monotone label propagation to a fixpoint inside `lax.while_loop`:

  - seed every foreground pixel with its own linear index + 1,
  - each round: 3x3 max-pool (8-connectivity diagonal links) then
    SEGMENTED max-scans along rows and columns, forward and backward
    (an associative scan over (reset, value) pairs that restarts at
    background pixels — long straight runs converge in one step instead
    of one pixel per iteration),
  - stop when no label changed (or a 64-round safety cap).

Every operator is monotone non-decreasing toward (and bounded by) the
component's maximum seed index, so the fixpoint labels each pixel with the
largest linear index in its 8-connected component — a canonical per-
component id that doubles as a scatter target.

Statistics then come from scatter reductions into (H*W,) buffers: count,
probability sum, bbox (scatter-min/max), and CENTERED second moments for
the principal-axis angle gate (two-pass: centroids first, then gather the
centroid per pixel — raw f32 moment sums around coordinate values of ~500
would lose the angle to cancellation). `lax.top_k` by pixel count selects
the K largest components; the host applies exactly the same gates as the
host path (ops/boxes.boxes_from_stats) and falls back to fetching the one
page's map only when a genuinely rotated component needs the exact
min-area-rect path.

Reference behavior anchor: same DB postprocess contract as ops/boxes.py
(Liao et al.; reference backend/services/ocr_service.py uses Azure which
does all of this server-side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _segmented_max_scan(
    vals: jnp.ndarray, background: jnp.ndarray, axis: int, reverse: bool
) -> jnp.ndarray:
    """Running max along `axis` that RESTARTS at background pixels.

    Associative combine over (reset, value): a reset absorbs everything
    before it. Standard segmented-scan construction, associative by case
    analysis."""

    def combine(a, b):
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, jnp.maximum(va, vb))

    _, out = lax.associative_scan(
        combine, (background, vals), axis=axis, reverse=reverse
    )
    return jnp.where(background, 0, out)


def _propagate_labels(binary: jnp.ndarray, max_rounds: int = 64) -> jnp.ndarray:
    """(H, W) bool -> int32 labels; every pixel of an 8-connected component
    ends up holding (1 + the largest linear index in the component); 0 on
    background."""
    h, w = binary.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels0 = jnp.where(binary, idx, 0)
    bg = ~binary

    def one_round(labels):
        pooled = lax.reduce_window(
            labels, jnp.int32(0), lax.max, (3, 3), (1, 1), "SAME"
        )
        labels = jnp.where(binary, pooled, 0)
        labels = _segmented_max_scan(labels, bg, axis=1, reverse=False)
        labels = _segmented_max_scan(labels, bg, axis=1, reverse=True)
        labels = _segmented_max_scan(labels, bg, axis=0, reverse=False)
        labels = _segmented_max_scan(labels, bg, axis=0, reverse=True)
        return labels

    def cond(state):
        _, changed, rounds = state
        return changed & (rounds < max_rounds)

    def body(state):
        labels, _, rounds = state
        new = one_round(labels)
        return new, jnp.any(new != labels), rounds + 1

    labels, _, _ = lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    return labels


def component_stats_single(
    prob: jnp.ndarray, bin_thresh: float, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W) float prob -> ((K, 7) stats, n_components).

    Stats channels: [count, score_sum, x0, y0, x1, y1, theta_dev] where
    theta_dev is the principal-axis deviation from 0/90 degrees in radians
    (the ops/boxes.py axis-aligned gate input). Rows are the K largest
    components by pixel count; rows with count == 0 are padding. Boxes in
    PROB-MAP coordinates (the caller rescales, same as the host path)."""
    h, w = prob.shape
    n = h * w
    binary = prob > bin_thresh
    labels = _propagate_labels(binary)

    flat = labels.reshape(-1)
    fg = flat > 0
    # scatter target: the component's canonical pixel index; background
    # goes out of bounds and is dropped by the scatter mode
    tgt = jnp.where(fg, flat - 1, n)
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    ones = jnp.ones((n,), jnp.float32)
    pf = prob.reshape(-1).astype(jnp.float32)

    acc = (
        jnp.zeros((n + 1, 4), jnp.float32)
        .at[tgt]
        .add(jnp.stack([ones, pf, xx, yy], axis=-1), mode="drop")
    )
    xy = jnp.stack([xx, yy], axis=-1)
    mn = (
        jnp.full((n + 1, 2), jnp.inf, jnp.float32)
        .at[tgt]
        .min(xy, mode="drop")
    )
    mx = (
        jnp.full((n + 1, 2), -jnp.inf, jnp.float32)
        .at[tgt]
        .max(xy, mode="drop")
    )

    counts = acc[:, 0]
    safe = jnp.maximum(counts, 1.0)
    cx = acc[:, 2] / safe
    cy = acc[:, 3] / safe
    # second pass: centered moments (gather each pixel's component centroid)
    tgt_c = jnp.minimum(tgt, n)
    dx = xx - cx[tgt_c]
    dy = yy - cy[tgt_c]
    m2 = (
        jnp.zeros((n + 1, 3), jnp.float32)
        .at[tgt]
        .add(jnp.stack([dx * dx, dy * dy, dx * dy], axis=-1), mode="drop")
    )
    mxx = m2[:, 0] / safe
    myy = m2[:, 1] / safe
    mxy = m2[:, 2] / safe
    theta = 0.5 * jnp.arctan2(2.0 * mxy, mxx - myy)
    dev = jnp.minimum(jnp.abs(theta), jnp.pi / 2 - jnp.abs(theta))

    top_counts, top_i = lax.top_k(counts[:n], k)
    stats = jnp.stack(
        [
            top_counts,
            acc[top_i, 1],
            jnp.where(top_counts > 0, mn[top_i, 0], 0.0),
            jnp.where(top_counts > 0, mn[top_i, 1], 0.0),
            jnp.where(top_counts > 0, mx[top_i, 0], 0.0),
            jnp.where(top_counts > 0, mx[top_i, 1], 0.0),
            dev[top_i],
        ],
        axis=-1,
    )
    n_comps = jnp.sum((counts[:n] > 0).astype(jnp.int32))
    return stats, n_comps


@functools.partial(jax.jit, static_argnames=("bin_thresh", "k"))
def component_stats(
    prob: jnp.ndarray, bin_thresh: float, k: int = 1024
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched: (B, H, W) -> ((B, K, 7), (B,) n_components)."""
    return jax.vmap(lambda p: component_stats_single(p, bin_thresh, k))(prob)
