"""On-device detection box statistics: prob map -> per-component stats, in-jit.

The det stage's largest wire item is the probability-map fetch (100-400 ms
per 8-page wave depending on tunnel weather, even 4-bit packed — PERF.md
"The wire"). The host only needs the map to run connected components and
per-component statistics; the boxes themselves are ~20 KB. This module
computes those statistics ON DEVICE so the det forward can return a tiny
(B, K, 12) stats tensor instead and the full map never crosses the wire on
the fast path (VERDICT r4 next-step 1(c): "emit boxes on-device ... shrink
the prob-map fetch to box lists").

Connected components the XLA way (no data-dependent loops on host):
monotone label propagation to a fixpoint inside `lax.while_loop`:

  - seed every foreground pixel with its own linear index + 1,
  - each round: 3x3 max-pool (8-connectivity diagonal links) then
    SEGMENTED row/column max-scans, forward and backward — running max
    that restarts at background, so straight runs converge in one step.
    Each segmented scan is THREE fused cumulative ops (cumsum of the
    background mask for a per-line segment id, then cummax over
    seg_id * M + label, then subtract) — an earlier tuple
    `associative_scan` lowered to dozens of small HLO ops per scan and
    dominated the kernel's device time with op overhead.
  - stop when no label changed (or a 64-round safety cap).

Every operator is monotone non-decreasing toward (and bounded by) the
component's maximum seed index, so the fixpoint labels each pixel with the
largest linear index in its 8-connected component — a canonical per-
component id that doubles as a scatter target.

Statistics then come from ONE-HOT MATMUL BINNING, not scatter (TPU scatter
at 230k updates measured ~70 ms/page): the up-to-K component roots (pixels
whose index equals their label) are enumerated with top_k, the (N, K)
membership matrix reduces count/score/centroid sums on the MXU, CENTERED
second moments give the principal-axis angle (centroids broadcast back per
pixel by the same matmul — raw f32 moment sums around coordinate values of
~500 would lose the angle to cancellation), and bbox + ORIENTED extents
come from fused masked min/max reduces. The oriented extents let the host
emit a principal-axis box for ROTATED components too — no prob-map fetch
even for them (the exact min-area-rect host fallback remains only for
component-count overflow past K).

The host applies exactly the same gates as the host path
(ops/boxes.boxes_from_stats).

Reference behavior anchor: same DB postprocess contract as ops/boxes.py
(Liao et al.; reference backend/services/ocr_service.py uses Azure which
does all of this server-side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# stats channel layout (keep ops/boxes.boxes_from_stats in sync):
# 0 count, 1 score_sum, 2 x0, 3 y0, 4 x1, 5 y1, 6 theta, 7 cx, 8 cy,
# 9 u0, 10 v0, 11 u1, 12 v1
# (theta = principal-axis angle; cx/cy = centroid; u/v = centroid-relative
# extents along/across the principal axis)
STATS_CHANNELS = 13


def _segmented_max_scan(
    vals: jnp.ndarray, background: jnp.ndarray, axis: int, reverse: bool
) -> jnp.ndarray:
    """Running max along `axis` that RESTARTS at background pixels.

    Encoded as fused cumulative ops: seg_id = cumsum(background) numbers
    the runs along the line; since labels < M, the key seg_id * M + label
    of any EARLIER run is strictly below the current run's base, so a
    plain cummax over keys is exactly the segmented max."""
    m = jnp.int32(vals.shape[0] * vals.shape[1] + 2)
    bg_in = jnp.flip(background, axis=axis) if reverse else background
    vals_in = jnp.flip(vals, axis=axis) if reverse else vals
    seg = jnp.cumsum(bg_in.astype(jnp.int32), axis=axis, dtype=jnp.int32)
    run = lax.cummax(seg * m + vals_in, axis=axis) - seg * m
    if reverse:
        run = jnp.flip(run, axis=axis)
    return jnp.where(background, 0, run)


def _propagate_labels(binary: jnp.ndarray, max_rounds: int = 64) -> jnp.ndarray:
    """(H, W) bool -> int32 labels; every pixel of an 8-connected component
    ends up holding (1 + the largest linear index in the component); 0 on
    background."""
    h, w = binary.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels0 = jnp.where(binary, idx, 0)
    bg = ~binary

    def one_round(labels):
        # SIX pools per round before the scans: scans only move labels
        # along rows/columns, so diagonal strokes advance via the pool —
        # a pool is ONE reduce_window op vs ~4 ops per scan, so stacking
        # pools is the cheap way to cut rounds on stroke-heavy pages
        # (convergence rounds ~ longest diagonal / pools-per-round).
        for _ in range(6):
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
    """(H, W) float prob -> ((K, 13) stats, total n_components).

    Stats channels: see STATS_CHANNELS above. Rows cover up to K
    components (enumeration order is arbitrary); rows with count == 0 are
    padding. All geometry in PROB-MAP coordinates (the caller rescales,
    same as the host path). n_components is the TOTAL component count —
    when it exceeds K the membership matrix is incomplete and the host
    must fall back to the exact map path."""
    h, w = prob.shape
    n = h * w
    binary = prob > bin_thresh
    labels = _propagate_labels(binary)

    flat = labels.reshape(-1)
    fg = flat > 0
    idx = jnp.arange(n, dtype=jnp.int32)
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    pf = prob.reshape(-1).astype(jnp.float32)

    # A component's ROOT is the pixel whose own index equals its label —
    # exactly one per component. TPU scatter over 230k updates measured
    # ~70 ms/page, so the per-component reduction is instead a ONE-HOT
    # MATMUL BINNING: enumerate up to K roots, build the (N, K) membership
    # matrix, and reduce sums on the MXU / extents with fused masked
    # reduces. Zero scatter ops.
    root_mask = fg & (flat == idx + 1)
    n_comps = jnp.sum(root_mask.astype(jnp.int32))
    root_idx, _ = lax.top_k(jnp.where(root_mask, idx, -1), k)  # (K,)
    present = root_idx >= 0
    root_label = jnp.where(present, root_idx + 1, -1)

    oh_bool = flat[:, None] == root_label[None, :]  # (N, K) membership
    oh = oh_bool.astype(jnp.float32)
    vals = jnp.stack([jnp.ones((n,), jnp.float32), pf, xx, yy], axis=-1)
    sums = lax.dot(
        oh.T, vals, precision=lax.Precision.HIGHEST
    )  # (K, 4): count, score_sum, sum_x, sum_y
    counts = sums[:, 0]
    safe = jnp.maximum(counts, 1.0)
    cx = sums[:, 2] / safe
    cy = sums[:, 3] / safe

    # centered moments: broadcast each component's centroid back to its
    # pixels with the same membership matmul (no gather)
    cx_pix = oh @ cx
    cy_pix = oh @ cy
    dx = xx - cx_pix
    dy = yy - cy_pix
    m2 = lax.dot(
        oh.T,
        jnp.stack([dx * dx, dy * dy, dx * dy], axis=-1),
        precision=lax.Precision.HIGHEST,
    )
    mxx = m2[:, 0] / safe
    myy = m2[:, 1] / safe
    mxy = m2[:, 2] / safe
    theta = 0.5 * jnp.arctan2(2.0 * mxy, mxx - myy)

    # oriented extents along each component's principal axis (host builds
    # a principal-axis box for rotated components from these — no map
    # fetch even for them)
    ct_pix = oh @ jnp.cos(theta)
    st_pix = oh @ jnp.sin(theta)
    u = dx * ct_pix + dy * st_pix
    v = -dx * st_pix + dy * ct_pix

    def member_min(vec):
        return jnp.min(
            jnp.where(oh_bool, vec[:, None], jnp.inf), axis=0
        )

    def member_max(vec):
        return jnp.max(
            jnp.where(oh_bool, vec[:, None], -jnp.inf), axis=0
        )

    def pad0(a):
        return jnp.where(present, a, 0.0)

    stats = jnp.stack(
        [
            counts,
            sums[:, 1],
            pad0(member_min(xx)),
            pad0(member_min(yy)),
            pad0(member_max(xx)),
            pad0(member_max(yy)),
            pad0(theta),
            pad0(cx),
            pad0(cy),
            pad0(member_min(u)),
            pad0(member_min(v)),
            pad0(member_max(u)),
            pad0(member_max(v)),
        ],
        axis=-1,
    )
    return stats, n_comps


@functools.partial(jax.jit, static_argnames=("bin_thresh", "k"))
def component_stats(
    prob: jnp.ndarray, bin_thresh: float, k: int = 256
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched: (B, H, W) -> ((B, K, 13), (B,) n_components)."""
    return jax.vmap(lambda p: component_stats_single(p, bin_thresh, k))(prob)
