"""Core config / mesh / charset tests."""

import jax
import numpy as np
import pytest

from ocr_system_tpu.core.config import Settings
from ocr_system_tpu.core.mesh import (
    MeshConfig,
    build_mesh,
    data_sharding,
    shard_batch,
)
from ocr_system_tpu.models.charsets import get_charset


class TestSettings:
    def test_defaults(self):
        s = Settings()
        assert s.confidence_threshold_high == 0.85
        assert s.confidence_threshold_medium == 0.60
        assert s.max_upload_size_bytes == 20 * 1024 * 1024

    def test_env_parsing(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PORT", "9000")
        monkeypatch.setenv("ENABLE_DESKEW", "false")
        monkeypatch.setenv("DET_IMAGE_BUCKETS", "320,640")
        monkeypatch.setenv("STORAGE_ROOT", str(tmp_path))
        s = Settings.from_env(env_file=None)
        assert s.port == 9000
        assert s.enable_deskew is False
        assert s.det_image_buckets == (320, 640)

    def test_env_file(self, tmp_path, monkeypatch):
        monkeypatch.delenv("PORT", raising=False)
        env = tmp_path / ".env"
        env.write_text("PORT=7777\n# comment\nDEBUG=true\n")
        s = Settings.from_env(env_file=env)
        assert s.port == 7777 and s.debug is True

    def test_mesh_shape_parse(self):
        s = Settings(mesh_shape="dp=4,tp=2")
        assert s.parsed_mesh_shape() == {"dp": 4, "tp": 2}

    def test_storage_paths_auto_create(self, tmp_path):
        s = Settings(storage_root=str(tmp_path / "st"))
        assert s.upload_path.is_dir()
        assert s.export_path.is_dir()
        assert s.processed_path.is_dir()


class TestMesh:
    def test_build_full_dp(self):
        mesh = build_mesh("dp=-1")
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("dp",)

    def test_build_dp_tp(self):
        mesh = build_mesh("dp=-1,tp=2")
        assert mesh.shape["tp"] == 2
        assert mesh.shape["dp"] == len(jax.devices()) // 2

    def test_invalid_two_unknowns(self):
        with pytest.raises(ValueError):
            MeshConfig.from_string("dp=-1,tp=-1").resolve(8)

    def test_indivisible(self):
        with pytest.raises(ValueError):
            MeshConfig.from_string("tp=3").resolve(8)

    def test_shard_batch_places_on_dp(self):
        mesh = build_mesh("dp=-1")
        x = np.zeros((8, 4), np.float32)
        sharded = shard_batch(mesh, x)
        assert sharded.sharding == data_sharding(mesh, 2)
        # computation over sharded input works
        y = jax.jit(lambda a: a + 1)(sharded)
        assert float(np.asarray(y).sum()) == 32.0


class TestCharsets:
    def test_roundtrip_latin(self):
        cs = get_charset("latin")
        ids = cs.encode("Hello, W0rld!")
        assert cs.decode(ids) == "Hello, W0rld!"

    def test_blank_reserved(self):
        cs = get_charset("latin")
        assert cs.id_to_char(0) == ""
        assert all(i > 0 for i in cs.encode("abc"))

    def test_devanagari(self):
        cs = get_charset("devanagari")
        text = "नमस्ते 123"
        assert cs.decode(cs.encode(text)) == text

    def test_multilingual_covers_both(self):
        cs = get_charset("multilingual")
        text = "Invoice चालान 42"
        assert cs.decode(cs.encode(text)) == text

    def test_unknown_charset_raises(self):
        with pytest.raises(ValueError):
            get_charset("klingon")
