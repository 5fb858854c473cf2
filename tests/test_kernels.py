"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocr_system_tpu.kernels.preprocess_pallas import (
    fused_enhance,
    fused_enhance_reference,
)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 64, 96, 3),  # tile == h path
        (1, 480, 128, 3),  # tiled path (3 tiles), aligned width
        (1, 480, 100, 3),  # unaligned width -> pad/slice path
    ],
)
def test_fused_enhance_matches_reference(shape):
    rng = np.random.default_rng(0)
    imgs = rng.random(shape).astype(np.float32)
    ref = fused_enhance_reference(jnp.asarray(imgs))
    out = fused_enhance(jnp.asarray(imgs), interpret=True)
    assert out.shape == ref.shape
    assert float(jnp.abs(ref - out).max()) < 1e-4


def test_output_is_normalized():
    imgs = np.full((1, 64, 128, 3), 0.5, np.float32)
    out = np.asarray(fused_enhance(jnp.asarray(imgs), interpret=True))
    # flat gray image: contrast/sharpness are identity, only normalization
    from ocr_system_tpu.ops.image_ops import NORM_MEAN, NORM_STD

    expect = (0.5 - np.array(NORM_MEAN)) / np.array(NORM_STD)
    np.testing.assert_allclose(out[0, 32, 64], expect, atol=1e-5)


class TestCropMatmul:
    """Interpolation-matmul crop kernel vs the separable-gather reference
    (semantics: /255, zero-pad past w_valid, border replication)."""

    def _case(self, P, N, S, H, W, seed=1, max_h=40, rows=None):
        import jax

        from ocr_system_tpu.engine.recognizer import _mask_pad
        from ocr_system_tpu.kernels.crop_pallas import crop_boxes_matmul
        from ocr_system_tpu.ops.sampling import crop_boxes_separable

        rng = np.random.default_rng(seed)
        rows = rows or S
        pages = rng.integers(0, 255, (P, rows, S), np.uint8)
        x0 = rng.uniform(-10, S - 60, (P, N))  # incl. off-page starts
        y0 = rng.uniform(-5, max(rows - 30, 2), (P, N))
        w = rng.uniform(20, 100, (P, N))
        h = rng.uniform(8, max_h, (P, N))
        aabbs = np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)
        wv = np.clip(w / h * H, 16, W).astype(np.int32)
        got = crop_boxes_matmul(
            jnp.asarray(pages), jnp.asarray(aabbs), jnp.asarray(wv),
            (H, W), interpret=True,
        )
        pg = jnp.asarray(pages).astype(jnp.float32) / 255.0
        ref = jax.vmap(
            lambda p, b: crop_boxes_separable(p, b, (H, W))
        )(pg, jnp.asarray(aabbs))
        ref = ref.reshape(-1, H, W)[..., None]
        ref = _mask_pad(ref, jnp.asarray(wv).reshape(-1))[..., 0]
        return float(jnp.abs(got - ref).max())

    def test_matches_separable_reference(self):
        assert self._case(2, 4, 256, 48, 320) < 1e-4

    def test_unaligned_page_width(self):
        # 200 is not a multiple of 128 -> internal pad path
        assert self._case(1, 3, 200, 48, 160) < 1e-4

    def test_page_edge_boxes_replicate_border(self):
        # boxes hanging off the page: coordinate clamping must reproduce
        # the gather path's border replication
        assert self._case(1, 4, 256, 48, 320, seed=7) < 1e-4

    def test_line_strip_pages(self):
        # evaluate_recognizer feeds (48, W) line strips — shorter than the
        # row slab; the slab must become the whole page, not a negative
        # DMA start (this exact shape broke on TPU once: rec CER 0.94)
        assert self._case(3, 2, 320, 48, 320, max_h=30, rows=48) < 1e-4
