#!/usr/bin/env python
"""Demo: render an invoice, run the full local pipeline, print what the
system read and extracted.

  python scripts/demo.py                       # classical det + neural rec
  python scripts/demo.py --engine jax          # neural det + neural rec
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def render_invoice() -> bytes:
    import io

    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGB", (900, 700), "white")
    d = ImageDraw.Draw(img)
    big = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 34
    )
    f = ImageFont.truetype("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 24)
    d.text((40, 30), "INVOICE", fill="black", font=big)
    lines = [
        "Invoice Number: 2024-0042",
        "Date: 15/01/2024",
        "Bill To: Acme Services Inc",
        "Email: billing@acme.com",
        "Phone: (555) 123-4567",
        "Total Amount: $1,234.56",
    ]
    for i, line in enumerate(lines):
        d.text((40, 110 + i * 55), line, fill="black", font=f)
    # small items table
    d.text((40, 460), "item", font=f, fill="black")
    d.text((340, 460), "quantity", font=f, fill="black")
    d.text((620, 460), "price", font=f, fill="black")
    for r, (a, b, c) in enumerate(
        [("services", "2", "$500.00"), ("tax", "1", "$234.56")]
    ):
        d.text((40, 505 + r * 45), a, font=f, fill="black")
        d.text((340, 505 + r * 45), b, font=f, fill="black")
        d.text((620, 505 + r * 45), c, font=f, fill="black")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--engine", default="classical", choices=["classical", "jax"])
    p.add_argument("--rec-checkpoint", default="checkpoints/rec_latin")
    p.add_argument("--det-checkpoint", default="checkpoints/det")
    args = p.parse_args()

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.pipeline import get_engine
    from ocr_system_tpu.extract.rules import RuleExtractor

    settings = Settings(
        ocr_engine=args.engine,
        rec_checkpoint=args.rec_checkpoint,
        det_checkpoint=args.det_checkpoint,
        storage_root="storage",
    )
    engine = get_engine(settings)
    print(f"engine: {args.engine} | running OCR...")
    result = engine.process_document(render_invoice(), "demo_invoice.png")
    print(f"\n=== OCR output ({result.processing_time_ms:.0f} ms, "
          f"{len(result.combined_layout_boxes)} boxes) ===")
    print(result.combined_markdown)

    extraction = RuleExtractor().extract(result.combined_markdown)
    print(f"\n=== Extracted fields (form type: {extraction.form_type}) ===")
    for f in extraction.fields:
        print(f"  {f.field_key:>18}: {f.field_value!r:30} [{f.field_type}]")


if __name__ == "__main__":
    main()
