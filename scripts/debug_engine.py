#!/usr/bin/env python
"""Manual OCR engine debug harness (reference: debug_azure_output.py:22-127).

Runs one image/PDF through the engine and dumps the layout-box structure —
the same golden-fixture shape the reference committed as
azure_debug_output.json.

  python scripts/debug_engine.py path/to/image.png [--engine fake] [--out out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--engine", default=None, help="jax | fake")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from ocr_system_tpu.core.config import Settings, get_settings

    settings = get_settings()
    if args.engine:
        settings = Settings(**{**settings.model_dump(), "ocr_engine": args.engine})

    from ocr_system_tpu.engine.pipeline import get_engine

    engine = get_engine(settings)
    data = Path(args.path).read_bytes()
    result = engine.process_document(data, Path(args.path).name)

    boxes = result.combined_layout_boxes
    by_type: dict[str, int] = {}
    for b in boxes:
        by_type[b["type"]] = by_type.get(b["type"], 0) + 1
    report = {
        "success": result.success,
        "error": result.error,
        "total_pages": result.total_pages,
        "processing_time_ms": round(result.processing_time_ms, 1),
        "combined_layout_boxes_count": len(boxes),
        "boxes_by_type": by_type,
        "combined_layout_boxes_sample": boxes[:10],
        "combined_markdown": result.combined_markdown[:2000],
        "pages": [
            {
                "page_number": pg.page_number,
                "layout_boxes_count": len(pg.layout_boxes),
                "has_processed_image": pg.processed_image is not None,
                "page_width": pg.page_width,
                "page_height": pg.page_height,
            }
            for pg in result.pages
        ],
    }
    text = json.dumps(report, indent=2, ensure_ascii=False, default=str)
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {args.out}")
    else:
        print(text)


if __name__ == "__main__":
    main()
