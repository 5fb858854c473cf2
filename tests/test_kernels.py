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
