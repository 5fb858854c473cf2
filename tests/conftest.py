"""Test configuration.

Tests run on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — the standard
substitute for a TPU pod (SURVEY.md §4). Env must be set before jax imports,
hence the top-of-conftest placement.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The image's sitecustomize (TPU tunnel) eagerly initializes jax backends,
# which pins the CPU client to 1 device before XLA_FLAGS can take effect.
# Drop any pre-initialized backends so the 8-device CPU mesh comes up.
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb._backends:
    _xb._clear_backends()

# Persistent compilation cache: the 8-dev CPU mesh compiles (train steps run
# ~3 min on this 1-core host) are paid once per machine, not per test run.
from ocr_system_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def settings(tmp_path_factory):
    """Settings pointed at a temp storage root, small shape buckets so CPU
    tests compile fast."""
    from ocr_system_tpu.core.config import Settings

    root = tmp_path_factory.mktemp("storage")
    return Settings(
        storage_root=str(root),
        database_path=str(root / "test.db"),
        det_image_buckets=(256,),
        rec_width_buckets=(80, 160),
        rec_batch_size=8,
        ocr_engine="fake",
        extraction_method="rules",  # deterministic tier for service tests
        enable_deskew=False,
    )


@pytest.fixture()
def form_image() -> np.ndarray:
    """A synthetic single-page form image (white page, dark text-ish bars)."""
    rng = np.random.default_rng(0)
    img = np.full((400, 600, 3), 255, np.uint8)
    for y in range(40, 360, 40):
        w = int(rng.integers(150, 500))
        img[y : y + 14, 30 : 30 + w] = 20
    return img


@pytest.fixture()
def form_png(form_image) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(form_image).save(buf, format="PNG")
    return buf.getvalue()
