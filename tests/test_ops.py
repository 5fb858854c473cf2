"""Unit tests for the compute ops (sampling, image pipeline, CTC, boxes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocr_system_tpu.ops import boxes, ctc, image_ops, sampling


class TestSampling:
    def test_rotate_identity(self):
        img = np.random.default_rng(0).random((32, 32)).astype(np.float32)
        out = sampling.rotate(jnp.array(img), 0.0)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)

    def test_rotate_roundtrip(self):
        img = np.zeros((64, 64), np.float32)
        img[20:24, 10:50] = 1.0
        r = sampling.rotate(jnp.array(img), 10.0)
        rr = sampling.rotate(r, -10.0)
        assert float(jnp.abs(rr - img).mean()) < 0.02

    def test_crop_quads_axis_aligned(self):
        img = np.zeros((40, 40), np.float32)
        img[10:20, 5:25] = 1.0
        quad = jnp.array([[[5.0, 10.0], [24.0, 10.0], [24.0, 19.0], [5.0, 19.0]]])
        crops = sampling.crop_quads(jnp.array(img), quad, (10, 20))
        assert crops.shape == (1, 10, 20)
        assert float(crops.mean()) > 0.9  # crop covers the bright region

    def test_crop_quads_rotated(self):
        # bright band along a rotated rectangle should rectify to mostly-bright
        img = np.zeros((64, 64), np.float32)
        img[28:36, 8:56] = 1.0
        rot = sampling.rotate(jnp.array(img), 20.0)
        # where did the band corners land? rotate() samples input at M @ out,
        # so input point p appears at out = M^-1 @ p.
        m = np.asarray(sampling.rotation_matrix(jnp.float32(20.0), (31.5, 31.5)))
        m_full = np.vstack([m, [0, 0, 1]])
        inv = np.linalg.inv(m_full)
        pts = np.array([[8, 28, 1], [55, 28, 1], [55, 35, 1], [8, 35, 1]], np.float32)
        quad = (pts @ inv.T)[:, :2].astype(np.float32)
        crops = sampling.crop_quads(rot, jnp.array(quad[None]), (8, 48))
        assert float(crops.mean()) > 0.7


class TestSeparableCrop:
    def test_matches_general_path_for_axis_aligned(self):
        rng = np.random.default_rng(3)
        img = rng.random((100, 120, 3)).astype(np.float32)
        quads = np.array(
            [
                [[10, 20], [60, 20], [60, 40], [10, 40]],
                [[5, 5], [100, 5], [100, 30], [5, 30]],
            ],
            np.float32,
        )
        general = sampling.crop_quads(jnp.array(img), jnp.array(quads), (16, 48))
        aabbs = sampling.quads_to_aabbs(quads)
        fast = sampling.crop_boxes_separable(jnp.array(img), jnp.array(aabbs), (16, 48))
        assert float(jnp.abs(general - fast).max()) < 0.05

    def test_alignment_check(self):
        straight = np.array([[[0, 0], [10, 0], [10, 5], [0, 5]]], np.float32)
        assert sampling.quads_are_axis_aligned(straight)
        tilted = np.array([[[0, 0], [10, 4], [10, 9], [0, 5]]], np.float32)
        assert not sampling.quads_are_axis_aligned(tilted)
        assert sampling.quads_are_axis_aligned(np.zeros((0, 4, 2)))


class TestImageOps:
    def test_letterbox_shape_and_scale(self):
        img = jnp.ones((100, 200))
        canvas, scale = image_ops.letterbox(img, (64, 64))
        assert canvas.shape == (64, 64)
        assert scale == pytest.approx(64 / 200)

    def test_deskew_recovers_synthetic_skew(self):
        page = np.ones((256, 256), np.float32)
        for y in range(30, 220, 20):
            page[y : y + 4, 20:230] = 0.0
        skewed = sampling.rotate(jnp.array(page), 5.0, fill_value=1.0)
        angle = image_ops.estimate_skew_angle(skewed)
        assert abs(float(angle) + 5.0) < 1.0

    def test_deskew_skips_small_angles(self):
        # reference behavior: < 0.5 deg -> no rotation applied
        page = np.ones((256, 256), np.float32)
        for y in range(30, 220, 20):
            page[y : y + 4, 20:230] = 0.0
        _, applied = image_ops.deskew(jnp.array(page))
        assert float(applied) == 0.0

    def test_deskew_not_fooled_by_stair_layout(self):
        """A sparse stair-stepped layout (each row indented further) can be
        sheared into one dense band, which outscored the true 0-degree
        alignment under the full-spectrum criterion — the estimator rotated
        a clean Hindi page -12 degrees into 0.89-CER garbage. The line-
        frequency band + angle-scaled evidence gate must return 0 here."""
        page = np.ones((256, 256), np.float32)
        for i, y in enumerate(range(20, 80, 12)):
            x0 = 20 + i * 30
            page[y : y + 5, x0 : x0 + 50] = 0.0
        angle = image_ops.estimate_skew_angle(jnp.array(page))
        assert float(angle) == 0.0

    def test_adaptive_binarize_binary_output(self):
        img = np.random.default_rng(1).random((64, 64)).astype(np.float32)
        out = np.asarray(image_ops.adaptive_binarize(jnp.array(img)))
        assert set(np.unique(out)).issubset({0.0, 1.0})

    def test_contrast_enhancement_range(self):
        img = jnp.full((16, 16), 0.5) + jnp.linspace(-0.2, 0.2, 16)[None, :]
        out = image_ops.enhance_contrast(img, 1.2)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        # spread must increase
        assert float(out.std()) > float(img.std())

    def test_median_denoise_removes_salt(self):
        img = np.full((32, 32), 0.8, np.float32)
        img[10, 10] = 0.0
        out = np.asarray(image_ops.median_denoise3(jnp.array(img)))
        assert out[10, 10] == pytest.approx(0.8)


class TestCTC:
    def test_greedy_decode_dedup_and_blank(self):
        # sequence 1,1,blank,2,2,3 -> [1,2,3]
        logits = np.full((1, 6, 5), -5.0, np.float32)
        for t, s in enumerate([1, 1, 0, 2, 2, 3]):
            logits[0, t, s] = 5.0
        ids, conf, n = ctc.ctc_greedy_decode(jnp.array(logits))
        assert ids[0, :3].tolist() == [1, 2, 3]
        assert int(n[0]) == 3
        assert ids[0, 3] == ctc.PAD_ID
        assert float(conf[0]) > 0.99

    def test_repeated_symbol_across_blank_kept(self):
        # 1,blank,1 -> [1,1]
        logits = np.full((1, 3, 4), -5.0, np.float32)
        for t, s in enumerate([1, 0, 1]):
            logits[0, t, s] = 5.0
        ids, _, n = ctc.ctc_greedy_decode(jnp.array(logits))
        assert ids[0, :2].tolist() == [1, 1]
        assert int(n[0]) == 2

    def test_lengths_mask(self):
        logits = np.full((1, 4, 4), -5.0, np.float32)
        for t, s in enumerate([1, 2, 3, 3]):
            logits[0, t, s] = 5.0
        ids, _, n = ctc.ctc_greedy_decode(jnp.array(logits), jnp.array([2]))
        assert int(n[0]) == 2
        assert ids[0, :2].tolist() == [1, 2]

    def test_all_blank(self):
        logits = np.full((1, 4, 4), -5.0, np.float32)
        logits[:, :, 0] = 5.0
        ids, conf, n = ctc.ctc_greedy_decode(jnp.array(logits))
        assert int(n[0]) == 0
        assert float(conf[0]) == 0.0

    def test_ctc_loss_decreases_for_correct_logits(self):
        labels = jnp.array([[1, 2, 3]])
        good = np.full((1, 6, 5), -3.0, np.float32)
        for t, s in enumerate([1, 0, 2, 0, 3, 0]):
            good[0, t, s] = 3.0
        bad = np.full((1, 6, 5), 0.0, np.float32)
        l_good = ctc.ctc_loss(jnp.array(good), jnp.array([6]), labels, jnp.array([3]))
        l_bad = ctc.ctc_loss(jnp.array(bad), jnp.array([6]), labels, jnp.array([3]))
        assert float(l_good) < float(l_bad)


class TestBoxes:
    def test_min_area_rect_axis_aligned(self):
        pts = np.array([[0, 0], [10, 0], [10, 4], [0, 4], [5, 2]])
        quad, w, h = boxes.min_area_rect(pts)
        assert w == pytest.approx(10, abs=0.1)
        assert h == pytest.approx(4, abs=0.1)

    def test_min_area_rect_rotated(self):
        theta = np.deg2rad(30)
        rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        base = np.array([[x, y] for x in range(0, 20) for y in range(0, 5)], float)
        pts = base @ rot.T + 50
        _, w, h = boxes.min_area_rect(pts)
        assert w == pytest.approx(19, abs=1.0)
        assert h == pytest.approx(4, abs=1.0)

    def test_unclip_expands(self):
        quad = np.array([[10, 10], [60, 10], [60, 20], [10, 20]], np.float32)
        out = boxes.unclip_quad(quad, 1.6)
        assert out[:, 0].min() < 10 and out[:, 0].max() > 60
        assert out[:, 1].min() < 10 and out[:, 1].max() > 20

    def test_boxes_from_prob_map(self):
        pm = np.zeros((100, 100), np.float32)
        pm[10:20, 10:60] = 0.95
        pm[40:50, 30:80] = 0.9
        found = boxes.boxes_from_prob_map(pm)
        assert len(found) == 2
        assert all(b.score > 0.6 for b in found)

    def test_box_thresh_filters(self):
        pm = np.zeros((50, 50), np.float32)
        pm[10:20, 10:40] = 0.4  # above bin_thresh, below box_thresh
        assert boxes.boxes_from_prob_map(pm, box_thresh=0.6) == []

    def test_scale_and_clip(self):
        pm = np.zeros((50, 50), np.float32)
        pm[40:50, 40:50] = 0.95
        found = boxes.boxes_from_prob_map(pm, scale_xy=(2.0, 2.0), clip_wh=(90, 90))
        assert len(found) == 1
        assert found[0].quad[:, 0].max() <= 89
        assert found[0].quad[:, 1].max() <= 89

    def test_fast_path_matches_exact_on_rectangles(self):
        """Filled-rectangle components take the vectorized AABB fast path;
        its quads must match hull+calipers+unclip within a pixel."""
        pm = np.zeros((200, 200), np.float32)
        rects = [(10, 20, 15, 80), (40, 50, 100, 190), (120, 135, 30, 44)]
        for y0, y1, x0, x1 in rects:
            pm[y0:y1, x0:x1] = 0.9
        found = boxes.boxes_from_prob_map(pm)
        assert len(found) == len(rects)
        for b in sorted(found, key=lambda b: b.quad[:, 1].min()):
            # exact slow-path reference for the same component
            ys, xs = np.nonzero(
                (pm > 0.3)
                & (np.arange(200)[:, None] >= b.quad[:, 1].min())
                & (np.arange(200)[:, None] <= b.quad[:, 1].max())
            )
            pts = boxes._row_extremes(xs, ys)
            ref, _, _ = boxes.min_area_rect(pts)
            ref = boxes.unclip_quad(ref, 1.6)
            assert np.abs(np.sort(b.quad, axis=0)
                          - np.sort(ref, axis=0)).max() < 1.5

    def test_rotated_component_uses_exact_path(self):
        """A thin diagonal stroke has low AABB fill: it must go through
        min_area_rect and come back as a genuinely rotated quad."""
        pm = np.zeros((100, 100), np.float32)
        for i in range(40):
            pm[20 + i, 20 + i : 26 + i] = 0.95  # 45-degree bar
        found = boxes.boxes_from_prob_map(pm)
        assert len(found) == 1
        q = found[0].quad
        # rotated: no edge is axis-aligned (x varies along the top edge)
        assert abs(q[0, 1] - q[1, 1]) > 3


class TestNative:
    def test_native_label_matches_scipy(self):
        from scipy import ndimage

        from ocr_system_tpu.native import cc_label

        rng = np.random.default_rng(42)
        img = (rng.random((64, 64)) > 0.7).astype(np.uint8)
        ours, n_ours = cc_label.label(img)
        _, n_scipy = ndimage.label(img, structure=np.ones((3, 3), int))
        assert n_ours == n_scipy
        # same pixels labeled
        assert ((ours > 0) == (img > 0)).all()

    def test_native_stats(self):
        from ocr_system_tpu.native import cc_label

        img = np.zeros((20, 20), np.uint8)
        img[2:6, 3:9] = 1
        prob = img.astype(np.float32) * 0.5
        lab, n = cc_label.label(img)
        counts, sums, bb = cc_label.stats(lab, prob, n)
        assert n == 1
        assert counts[1] == 24
        assert sums[1] == pytest.approx(12.0)
        assert bb[1].tolist() == [3, 2, 8, 5]

    def test_fused_analyze_matches_numpy_analysis(self):
        """cc_analyze_u8 (one fused native pass) must reproduce the numpy
        analysis bit-for-bit: the box extractor's fast/slow routing, scores,
        and principal-axis gate all ride on these statistics."""
        from ocr_system_tpu.native import cc_label
        from ocr_system_tpu.ops import boxes as bx

        rng = np.random.default_rng(3)
        pm = np.zeros((240, 240), np.float32)
        for _ in range(25):
            y, x = rng.integers(0, 220), rng.integers(0, 180)
            pm[y : y + rng.integers(3, 12), x : x + rng.integers(8, 50)] = (
                rng.uniform(0.5, 1.0)
            )
        for i in range(60):  # rotated bar
            pm[100 + i // 2, 30 + i : 34 + i] = 0.9
        binary = (pm > 0.3).astype(np.uint8)
        lab_n, n_n, cnt_n, sum_n, bb_n, mom_n = cc_label.analyze(binary, pm)

        import builtins

        real_import = builtins.__import__

        def no_native(name, *a, **k):
            if "native" in name:
                raise ImportError(name)
            return real_import(name, *a, **k)

        builtins.__import__ = no_native
        try:
            lab_p, n_p, cnt_p, sum_p, bb_p, mom_p = bx._component_analysis(
                binary, pm, None, 1
            )
        finally:
            builtins.__import__ = real_import

        assert n_n == n_p
        # label ids may differ between labelers; match components by bbox
        key_n = np.lexsort(bb_n[1:].T)
        key_p = np.lexsort(bb_p[1:].T)
        assert (bb_n[1:][key_n] == bb_p[1:][key_p]).all()
        assert (cnt_n[1:][key_n] == cnt_p[1:][key_p]).all()
        np.testing.assert_allclose(
            sum_n[1:][key_n], sum_p[1:][key_p], rtol=1e-6
        )
        np.testing.assert_allclose(
            mom_n[1:][key_n], mom_p[1:][key_p], rtol=1e-9
        )

    def test_fused_analyze_strided_score(self):
        """stride>1 sampling (1-bit wire pooled score map) must equal the
        numpy np.ix_ expansion path."""
        from ocr_system_tpu.native import cc_label

        rng = np.random.default_rng(5)
        binary = np.zeros((64, 64), np.uint8)
        binary[10:20, 8:40] = 1
        binary[40:44, 50:62] = 1
        score = rng.uniform(0, 1, (16, 16)).astype(np.float32)
        _, n, counts, sums, _, _ = cc_label.analyze(binary, score, stride=4)
        assert n == 2
        yy = (np.arange(64) // 4).clip(0, 15)
        xx = (np.arange(64) // 4).clip(0, 15)
        full = score[np.ix_(yy, xx)]
        lab, _ = cc_label.label(binary)
        for comp in (1, 2):
            ref = full[lab == comp].sum()
            got = sums[comp] if counts[comp] else 0.0
            assert got == pytest.approx(ref, rel=1e-6)


class TestNativeInkWalk:
    def test_matches_python_ink_snap(self):
        """The native batch op must be BIT-EXACT with the Python reference
        (detector._ink_snap expand_only) — it replaces it on the serving
        path, one GIL-free call per page."""
        from ocr_system_tpu.engine.detector import _ink_snap
        from ocr_system_tpu.native.ink_walk import ink_expand_batch

        rng = np.random.default_rng(7)
        gray = np.full((400, 600), 245, np.uint8)
        # words, a full-width rule, and a vertical rule
        for y in range(30, 360, 40):
            x = 20
            while x < 540:
                w = int(rng.integers(20, 70))
                gray[y:y + 12, x:x + w] = rng.integers(0, 60)
                x += w + 15
        gray[200, :] = 80        # horizontal table rule
        gray[:, 300] = 80        # vertical rule
        quads = np.stack([
            np.array([[x, y], [x + 40, y], [x + 40, y + 10], [x, y + 10]],
                     np.float32)
            for y in range(32, 350, 40) for x in (25, 120, 320)
        ])
        ref = quads.copy()
        for q in ref:
            _ink_snap(gray, q, expand_only=True)
        nat = quads.copy()
        ink_expand_batch(gray, nat)
        assert np.abs(ref - nat).max() == 0.0

    def test_empty_quads(self):
        from ocr_system_tpu.native.ink_walk import ink_expand_batch

        out = ink_expand_batch(
            np.zeros((10, 10), np.uint8), np.zeros((0, 4, 2), np.float32)
        )
        assert out.shape == (0, 4, 2)
