"""CTC decoding (and loss re-export) for the recognition head.

The reference never decodes CTC itself — recognition happens inside Azure or
the PaddleOCR binary. Here greedy CTC decode is implemented IN-GRAPH with
static shapes: argmax + shift-dedup + mask-compaction, so a whole batch of
text-line crops decodes on the VPU without leaving the device; only the final
int32 id matrix crosses to host for charset lookup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLANK_ID = 0  # convention: charset index 0 is the CTC blank
PAD_ID = -1  # padding value in decoded id matrices


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_greedy_decode(
    logits: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    blank_id: int = BLANK_ID,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy (best-path) CTC decode, fully vectorized.

    Args:
      logits: (B, T, V) unnormalized scores.
      lengths: (B,) valid timestep counts (<= T); None means all T valid.

    Returns:
      ids:   (B, T) int32, decoded symbols left-packed, PAD_ID elsewhere.
      conf:  (B,) float32, mean max-prob over emitting (kept) steps; 1.0-eps
             style confidence comparable to the reference's per-word scores.
      n:     (B,) int32, number of decoded symbols.
    """
    b, t, _ = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    best_p = jnp.max(probs, axis=-1)  # (B, T)
    best = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # (B, T)

    steps = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    valid = steps < (lengths[:, None] if lengths is not None else t)

    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), best[:, :-1]], axis=1)
    keep = (best != blank_id) & (best != prev) & valid  # (B, T)

    # Left-pack kept ids: position = cumsum(keep)-1, scatter into (B, T).
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # (B, T)
    pos = jnp.where(keep, pos, t)  # dropped entries scatter into overflow col
    out = jnp.full((b, t + 1), PAD_ID, jnp.int32)
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (b, t), 0)
    out = out.at[batch_idx.reshape(-1), pos.reshape(-1)].set(
        best.reshape(-1), mode="drop"
    )
    ids = out[:, :t]

    n = jnp.sum(keep, axis=1).astype(jnp.int32)
    kept_p_sum = jnp.sum(jnp.where(keep, best_p, 0.0), axis=1)
    conf = jnp.where(n > 0, kept_p_sum / jnp.maximum(n, 1), 0.0)
    return ids, conf, n


_LOOKUP_CACHE: dict[str, object] = {}


def _char_table(charset):
    tbl = _LOOKUP_CACHE.get(charset.name)
    if tbl is None:
        import numpy as np

        tbl = np.array(["\0"] + list(charset.chars), dtype="U1")
        _LOOKUP_CACHE[charset.name] = tbl
    return tbl


def ids_to_text(ids, charset) -> list[str]:
    """Host-side: (B, T) padded id matrix -> list of strings via `charset`
    (see models/charsets.py). Stops at first PAD_ID per row.

    Vectorized: one table gather + one join for the whole batch — the
    per-char `id_to_char` loop was ~150 ms of the 8-page serving wave
    (1254 boxes x T method calls on the 1-core bench host)."""
    import numpy as np

    ids = np.asarray(ids)
    if ids.ndim == 1:
        ids = ids[None]
    t = ids.shape[1]
    valid = ids != PAD_ID
    # rows are left-packed: the valid prefix ends at the first PAD
    prefix = np.cumprod(valid, axis=1, dtype=bool)
    # decoded prefixes exclude blanks by construction; guard out-of-range
    # ids anyway (id_to_char returned "" for them)
    emit = prefix & (ids > 0) & (ids <= len(charset.chars))
    n = emit.sum(axis=1)
    chars = _char_table(charset)[np.where(emit, ids, 0)]
    joined = "".join(chars[emit].tolist())
    bounds = np.concatenate([[0], np.cumsum(n)]).tolist()
    return [joined[a:b] for a, b in zip(bounds[:-1], bounds[1:])]


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = BLANK_ID,
) -> jnp.ndarray:
    """Mean CTC loss over the batch (training path; optax provides the
    forward-backward recursion as a lax.scan)."""
    import optax

    t = logits.shape[1]
    l = labels.shape[1]
    steps = jax.lax.broadcasted_iota(jnp.int32, logits.shape[:2], 1)
    logit_pad = (steps >= logit_lengths[:, None]).astype(jnp.float32)
    lsteps = jax.lax.broadcasted_iota(jnp.int32, labels.shape, 1)
    label_pad = (lsteps >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, labels, label_pad, blank_id=blank_id
    )
    return jnp.mean(per_seq)
