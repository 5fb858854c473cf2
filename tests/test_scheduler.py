"""Page scheduler: wave dispatch + page-level retry / poison isolation."""

import numpy as np

from ocr_system_tpu.engine.pipeline import FakeOCREngine
from ocr_system_tpu.engine.preprocess import PageImage
from ocr_system_tpu.engine.scheduler import PageScheduler


def _pages(n):
    return [
        PageImage(np.full((40, 60, 3), 255, np.uint8), i + 1) for i in range(n)
    ]


class _WaveEngine(FakeOCREngine):
    """Engine whose batch path fails when a poison page is in the wave, but
    single-page dispatch succeeds except for the truly-broken page."""

    def __init__(self, settings, poison_pages=(), broken_pages=()):
        super().__init__(settings, text="K: V")
        self.poison = set(poison_pages)
        self.broken = set(broken_pages)
        self.batch_calls = 0
        self.single_calls = 0

    def process_pages(self, pages):
        if len(pages) > 1:
            self.batch_calls += 1
            if any(p.page_number in self.poison | self.broken for p in pages):
                raise RuntimeError("wave crash")
        else:
            self.single_calls += 1
            if pages[0].page_number in self.broken:
                raise RuntimeError("page crash")
        from ocr_system_tpu.engine.pipeline import OCROutput

        return [
            OCROutput(
                success=True,
                markdown="K: V",
                page_number=p.page_number,
                page_width=float(p.width),
                page_height=float(p.height),
            )
            for p in pages
        ]


def test_happy_path_single_wave(settings):
    eng = _WaveEngine(settings)
    sched = PageScheduler(eng, settings)
    out = sched.process(_pages(3))
    assert len(out) == 3
    assert all(o.success for o in out)
    assert sched.stats.retried_pages == 0


def test_poison_page_isolated_by_retry(settings):
    eng = _WaveEngine(settings, poison_pages={2})
    sched = PageScheduler(eng, settings)
    out = sched.process(_pages(4))
    # wave failed, each page re-dispatched individually, all succeed
    assert all(o.success for o in out)
    assert sched.stats.retried_pages == 4
    assert sched.stats.failed_pages == 0


def test_broken_page_fails_without_sinking_document(settings):
    eng = _WaveEngine(settings, broken_pages={3})
    sched = PageScheduler(eng, settings)
    out = sched.process(_pages(4))
    assert [o.success for o in out] == [True, True, False, True]
    assert out[2].error and "failed" in out[2].error
    assert out[2].page_number == 3
    assert sched.stats.failed_pages == 1


def test_wave_partitioning(settings):
    eng = _WaveEngine(settings)
    sched = PageScheduler(eng, settings)
    # det_batch_size=8 default in fixture settings
    out = sched.process(_pages(20))
    assert len(out) == 20
    assert sched.stats.waves == (20 + settings.det_batch_size - 1) // settings.det_batch_size
