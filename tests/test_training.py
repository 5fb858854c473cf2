"""Training subsystem tests: synth data, sharded train steps, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np

from ocr_system_tpu.core.mesh import build_mesh
from ocr_system_tpu.models.charsets import get_charset
from ocr_system_tpu.training import synth
from ocr_system_tpu.training import train as T

charset = get_charset("latin")


class TestSynth:
    def test_render_line_shapes_and_label(self):
        r = synth.TextRenderer(charset, seed=1)
        s = r.render_line("Hello 42", max_width=320)
        assert s.image.shape == (48, 320, 3)
        assert 0 < s.width <= 320
        assert s.text == "Hello 42"
        # ink present in valid region
        assert s.image[:, : s.width].mean() < 0.99

    def test_random_text_encodable(self):
        r = synth.TextRenderer(charset, seed=2)
        for _ in range(20):
            t = r.random_text()
            assert t
            assert charset.encode(t)

    def test_render_page_targets(self):
        r = synth.TextRenderer(charset, seed=3)
        page = r.render_page(size=256)
        assert page.image.shape == (256, 256, 3)
        assert len(page.quads) == len(page.texts) > 0
        assert page.shrink_map.max() == 1.0  # positives exist
        assert page.thresh_mask.sum() > 0  # border band exists
        # shrink positives sit inside quads
        ys, xs = np.nonzero(page.shrink_map)
        assert xs.min() >= page.quads[:, :, 0].min() - 1

    def test_layout_tokens_bio_tags(self):
        r = synth.TextRenderer(charset, seed=4)
        page = r.render_page(size=256)
        ids, boxes, mask, tags, types = synth.layout_page_to_tokens(
            page, charset, max_len=256, page_size=256
        )
        assert ids.shape == (256,)
        n = mask.sum()
        assert n > 0
        has_kv = any(":" in t for t in page.texts)
        if has_kv:
            assert (tags == 1).any()  # B-KEY
            assert (tags == 3).any()  # B-VAL


class TestTrainSteps:
    def test_rec_loss_decreases(self):
        mesh = build_mesh("dp=-1")
        from ocr_system_tpu.models.recognizer import SVTRRecognizer

        model = SVTRRecognizer(vocab_size=charset.size, dim=48, depth=1, heads=2)
        opt = T.make_optimizer(3e-3)
        state = T.init_state(
            model, opt, jax.random.PRNGKey(0),
            jnp.zeros((1, 48, 80, 3)), jnp.array([80]), train=False,
        )
        step = T.make_rec_train_step(model, opt, mesh)
        it = T.rec_batch_iterator(charset, 8, width=80, max_label_len=16, seed=0)
        losses = []
        batch0 = {k: jnp.asarray(v) for k, v in next(it).items()}
        for i in range(8):
            state, m = step(state, dict(batch0))  # overfit one batch
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_det_step_runs(self):
        mesh = build_mesh("dp=-1")
        from ocr_system_tpu.models.dbnet import DBNet

        model = DBNet(neck_features=32)
        opt = T.make_optimizer(1e-3)
        state = T.init_state(
            model, opt, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), train=True,
        )
        step = T.make_det_train_step(model, opt, mesh)
        it = T.det_batch_iterator(8, size=64, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        assert state.step == 1

    def test_layout_step_tp_sharded(self):
        mesh = build_mesh("dp=-1,tp=2")
        from ocr_system_tpu.models.layout_extractor import LayoutExtractor

        model = LayoutExtractor(vocab_size=charset.size, dim=32, depth=1, heads=2)
        opt = T.make_optimizer(1e-3)
        example = (
            jnp.zeros((1, 16), jnp.int32),
            jnp.zeros((1, 16, 4), jnp.int32),
            jnp.ones((1, 16), jnp.int32),
        )
        state = T.init_layout_state_sharded(model, opt, mesh, example)
        # mlp kernel is actually split over tp
        spec = state.params["block0"]["up"]["kernel"].sharding.spec
        assert "tp" in str(spec)
        step = T.make_layout_train_step(model, opt, mesh)
        it = T.layout_batch_iterator(charset, 8, max_len=32, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from ocr_system_tpu.core.checkpoint import load_checkpoint, save_checkpoint

        tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
        path = save_checkpoint(tmp_path / "ck", tree)
        loaded = load_checkpoint(path, tree)
        np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])

    def test_maybe_load_missing_returns_none(self):
        from ocr_system_tpu.core.checkpoint import maybe_load

        assert maybe_load("") is None
        assert maybe_load("/nonexistent/path") is None


def test_graft_entry_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256)


class TestDevanagari:
    def test_font_builds_and_renders_distinct_glyphs(self, tmp_path):
        from PIL import Image, ImageDraw, ImageFont

        from ocr_system_tpu.training.devanagari_font import build_font

        p = build_font(tmp_path / "dev.ttf")
        f = ImageFont.truetype(str(p), 40)

        def render(txt):
            img = Image.new("L", (200, 80), 255)
            ImageDraw.Draw(img).text((5, 5), txt, font=f, fill=0)
            return np.asarray(img)

        ka, kha, na = render("क"), render("ख"), render("न")
        assert (ka < 128).sum() > 50  # ink, not tofu/blank
        assert (ka != kha).sum() > 100  # distinct glyphs
        assert (ka != na).sum() > 100

    def test_renderer_picks_covering_font(self):
        from ocr_system_tpu.models.charsets import get_charset
        from ocr_system_tpu.training.devanagari_font import FONT_NAME

        r = synth.TextRenderer(get_charset("devanagari"), seed=1)
        assert all(FONT_NAME in str(p) for p in r.font_paths), r.font_paths
        # Latin renderer keeps the DejaVu set
        r2 = synth.TextRenderer(get_charset("latin"), seed=1)
        assert any("DejaVu" in str(p) for p in r2.font_paths)

    def test_devanagari_line_and_page_render(self):
        from ocr_system_tpu.models.charsets import get_charset

        cs = get_charset("devanagari")
        r = synth.TextRenderer(cs, seed=2)
        line = r.render_line(max_width=160)
        assert line.image.min() < 0.5  # ink present
        assert line.text and all(cs.char_to_id(c) >= 0 for c in line.text)
        page = r.render_page(size=512)
        assert len(page.texts) > 0
        assert page.shrink_map.max() == 1.0
