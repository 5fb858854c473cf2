"""Profile the serving wave path on the real TPU: per-stage walls +
cProfile of the host side of a warm wave.

Usage: python scripts/profile_wave.py [n_waves]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_page  # noqa: E402

from ocr_system_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from ocr_system_tpu.core.config import Settings  # noqa: E402
from ocr_system_tpu.engine.pipeline import JaxOCREngine  # noqa: E402
from ocr_system_tpu.engine.preprocess import PageImage  # noqa: E402
from ocr_system_tpu.engine.scheduler import PageScheduler  # noqa: E402


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size, wave = 960, 8
    ckpt = lambda p: p if os.path.isdir(p) else ""
    settings = Settings(
        det_image_buckets=(384, size),
        rec_width_buckets=(320,),
        rec_batch_size=64,
        det_batch_size=wave,
        det_checkpoint=ckpt("checkpoints/det"),
        rec_checkpoint=ckpt("checkpoints/rec_latin"),
        enable_deskew=True,
        enable_contrast_enhancement=True,
        det_wire_bits=4,
        det_prob_wire_bits=int(os.environ.get("PROB_WIRE_BITS", "4")),
        storage_root="storage",
    )
    t0 = time.perf_counter()
    engine = JaxOCREngine(settings)
    print(f"engine built in {time.perf_counter() - t0:.1f}s", flush=True)

    pages = [
        PageImage(pixels=make_page(size, seed=i), page_number=i + 1)
        for i in range(wave * n_waves)
    ]

    # warm (compile / executable load)
    t0 = time.perf_counter()
    engine.process_pages(pages[:wave])
    print(f"warm wave: {time.perf_counter() - t0:.2f}s", flush=True)

    os.environ["OCR_DET_PROFILE"] = "1"

    # sequential (non-pipelined) timings per stage
    from ocr_system_tpu.engine.detector import Detector

    for k in range(2):
        t0 = time.perf_counter()
        dets = engine.det_stage(pages[:wave])
        t1 = time.perf_counter()
        outs = engine.rec_stage(pages[:wave], dets)
        t2 = time.perf_counter()
        nbox = sum(len(d.boxes) for d in dets)
        print(
            f"seq wave {k}: det {t1 - t0:.3f}s rec {t2 - t1:.3f}s "
            f"({nbox} boxes) det_prof={getattr(Detector, 'last_profile', None)} "
            f"rec_prof={JaxOCREngine.last_rec_profile}",
            flush=True,
        )

    # pipelined scheduler throughput
    sched = PageScheduler(engine, settings)
    t0 = time.perf_counter()
    sched.process(pages)
    dt = time.perf_counter() - t0
    print(
        f"scheduler: {len(pages)} pages in {dt:.2f}s -> "
        f"{len(pages) / dt:.2f} p/s  stages={sched.timer.as_ms()}",
        flush=True,
    )

    # cProfile of one full wave (det+rec, host side; device waits show as
    # block time inside jax internals)
    pr = cProfile.Profile()
    pr.enable()
    dets = engine.det_stage(pages[:wave])
    engine.rec_stage(pages[:wave], dets)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue(), flush=True)


if __name__ == "__main__":
    main()
