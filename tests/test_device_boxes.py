"""On-device box statistics (ops/device_boxes) vs the host reference path.

The device kernel must reproduce the host component analysis exactly where
the geometry is axis-aligned, and within a tight IoU for rotated
components (principal-axis box vs exact min-area-rect)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ocr_system_tpu.ops import boxes as B


def _stats(pm, k=128, thresh=0.3):
    from ocr_system_tpu.ops.device_boxes import component_stats

    st, n = component_stats(pm[None], thresh, k)
    return np.asarray(st[0]), int(np.asarray(n)[0])


class TestPropagation:
    def test_labels_word_grid_counts(self):
        rng = np.random.default_rng(1)
        pm = np.zeros((200, 200), np.float32)
        n_rects = 0
        for r in range(8):
            for c in range(4):
                y, x = 8 + r * 24, 8 + c * 48
                pm[y : y + rng.integers(5, 12), x : x + rng.integers(14, 40)] = 0.9
                n_rects += 1
        _, n = _stats(pm)
        assert n == n_rects

    def test_u_shape_single_component(self):
        """Propagation must close around corners (scans alone cannot)."""
        pm = np.zeros((120, 120), np.float32)
        pm[20:90, 20:26] = 0.9
        pm[84:90, 20:80] = 0.9
        pm[20:90, 74:80] = 0.9
        _, n = _stats(pm)
        assert n == 1

    def test_diagonal_stroke_single_component(self):
        """Diagonal (8-connectivity) chains converge via the pooling step —
        this also regression-tests the REVERSE segmented scan (a flipped
        forward cumsum once zeroed every label)."""
        pm = np.zeros((100, 100), np.float32)
        for i in range(60):
            pm[20 + i, 20 + i] = 0.9
        st, n = _stats(pm)
        assert n == 1
        assert st[0, 0] == 60  # count

    def test_matches_host_analysis(self):
        rng = np.random.default_rng(3)
        pm = np.zeros((160, 160), np.float32)
        for _ in range(25):
            y, x = rng.integers(0, 140), rng.integers(0, 120)
            pm[y : y + rng.integers(3, 12), x : x + rng.integers(8, 40)] = (
                rng.uniform(0.5, 1.0)
            )
        st, n = _stats(pm, k=128)
        binary = (pm > 0.3).astype(np.uint8)
        _, n_ref, counts, sums, bboxes, _ = B._component_analysis(
            binary, pm, None, 1
        )
        rows = st[st[:, 0] > 0]
        assert len(rows) == n_ref
        key_d = np.lexsort(rows[:, 2:6].T.astype(np.int64))
        host = np.stack(
            [counts[1:], sums[1:], bboxes[1:, 0], bboxes[1:, 1],
             bboxes[1:, 2], bboxes[1:, 3]], -1,
        ).astype(np.float64)
        key_h = np.lexsort(host[:, 2:6].T.astype(np.int64))
        d, h = rows[key_d], host[key_h]
        assert (d[:, 0] == h[:, 0]).all()
        assert (d[:, 2:6] == h[:, 2:6]).all()
        np.testing.assert_allclose(d[:, 1], h[:, 1], rtol=1e-5)


class TestBoxesFromStats:
    def test_axis_aligned_bitmatch(self):
        rng = np.random.default_rng(1)
        pm = np.zeros((200, 200), np.float32)
        for r in range(8):
            for c in range(4):
                y, x = 8 + r * 24, 8 + c * 48
                pm[y : y + rng.integers(5, 12), x : x + rng.integers(14, 40)] = (
                    rng.uniform(0.65, 0.95)
                )
        st, n = _stats(pm)
        bs = B.boxes_from_stats(
            st, n, box_thresh=0.6, scale_xy=(2.0, 2.0), clip_wh=(400, 400)
        )
        bh = B.boxes_from_prob_map(
            pm, box_thresh=0.6, scale_xy=(2.0, 2.0), clip_wh=(400, 400)
        )
        assert bs is not None and len(bs) == len(bh)
        key = lambda b: (round(float(b.quad[0, 1])), round(float(b.quad[0, 0])))
        qd = np.stack([b.quad for b in sorted(bs, key=key)])
        qh = np.stack([b.quad for b in sorted(bh, key=key)])
        assert float(np.abs(qd - qh).max()) == 0.0

    @pytest.mark.parametrize("ang_deg", [5, 12, 25, 40])
    def test_rotated_component_iou(self, ang_deg):
        """Rotated ragged bars: the device principal-axis box must overlap
        the host's exact min-area-rect at IoU >= 0.95."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(ang_deg)
        pm = np.zeros((240, 240), np.float32)
        a = math.radians(ang_deg)
        c, s = math.cos(a), math.sin(a)
        yy, xx = np.mgrid[0:240, 0:240]
        u = (xx - 120) * c + (yy - 120) * s
        v = -(xx - 120) * s + (yy - 120) * c
        core = (np.abs(u) < 55) & (np.abs(v) < 7)
        noise = rng.random((240, 240)) < 0.25
        pm[core & ~(noise & (np.abs(v) > 4))] = 0.9
        st, n = _stats(pm, k=64)
        bs = [
            b for b in B.boxes_from_stats(st, n, box_thresh=0.6)
            if b.score > 0.6
        ]
        bh = B.boxes_from_prob_map(pm, box_thresh=0.6)
        assert len(bs) == 1 and len(bh) == 1
        sc = 10
        m1 = np.zeros((2600, 2600), np.uint8)
        m2 = np.zeros((2600, 2600), np.uint8)
        cv2.fillPoly(m1, [np.round(bs[0].quad * sc).astype(np.int32)], 1)
        cv2.fillPoly(m2, [np.round(bh[0].quad * sc).astype(np.int32)], 1)
        iou = (m1 & m2).sum() / max((m1 | m2).sum(), 1)
        assert iou >= 0.95

    def test_overflow_returns_none(self):
        st = np.zeros((8, 13), np.float32)
        assert B.boxes_from_stats(st, 9) is None
