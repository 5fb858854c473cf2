"""Host-side page ingestion: codecs, EXIF, PDF raster, bucket assignment.

This is the codec boundary the SURVEY assigns to the host (§2.3): JPEG/PNG
decode, EXIF auto-orientation (reference image_preprocessing.py:57-79), PDF
page rasterization (reference uses pdf2image/poppler at 300 DPI,
:248-295), and JPEG re-encode of processed pages for the review UI
(file_manager.save_processed_image, :262-291). Everything downstream of the
decoded uint8 array is device compute (ops/image_ops.py).

PDF rasterization is three-tier: pdf2image/poppler when installed (the
reference's path; deploy/Dockerfile installs poppler-utils), else the
first-party content-stream renderer (engine/pdf.py — text/vector/hybrid
pages), else the embedded-image extractor below (last-resort scan salvage).
"""

from __future__ import annotations

import io
import zlib
from dataclasses import dataclass

import numpy as np
from PIL import Image, ImageOps

Image.MAX_IMAGE_PIXELS = 512 * 1024 * 1024  # guard against decompression bombs


@dataclass
class PageImage:
    pixels: np.ndarray  # (H, W, 3) uint8 RGB
    page_number: int  # 1-based
    dpi: int = 300

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @property
    def height(self) -> int:
        return self.pixels.shape[0]


def decode_image(data: bytes) -> np.ndarray:
    """bytes -> (H, W, 3) uint8 RGB, EXIF auto-oriented (reference
    image_preprocessing.py:57-79 ImageOps.exif_transpose + RGB coercion)."""
    img = Image.open(io.BytesIO(data))
    img = ImageOps.exif_transpose(img)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def encode_jpeg(pixels: np.ndarray, quality: int = 92) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(pixels).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def compress_to_limit(pixels: np.ndarray, max_bytes: int = 2 * 1024 * 1024) -> bytes:
    """Iterative JPEG compression to a byte budget (reference
    compress_for_azure, image_preprocessing.py:496-557: quality 95 -> 30,
    then downscale)."""
    for quality in range(95, 25, -10):
        data = encode_jpeg(pixels, quality)
        if len(data) <= max_bytes:
            return data
    img = Image.fromarray(pixels)
    while True:
        img = img.resize((max(img.width // 2, 64), max(img.height // 2, 64)))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=60)
        data = buf.getvalue()
        if len(data) <= max_bytes or img.width <= 64:
            return data


# ---- minimal PDF raster ----


def _pdf_extract_images(data: bytes) -> list[np.ndarray]:
    """Extract embedded image XObjects from a PDF byte stream.

    Handles DCTDecode (JPEG passthrough to PIL) and FlateDecode raw bitmaps
    (DeviceRGB/DeviceGray) — the encodings scanners produce. Parsing is
    tolerant: any stream it can't decode is skipped.
    """
    out: list[np.ndarray] = []
    pos = 0
    while True:
        s = data.find(b"stream", pos)
        if s < 0:
            break
        # locate the dict preceding this stream
        d = data.rfind(b"<<", 0, s)
        header = data[d:s] if d >= 0 else b""
        body_start = s + len(b"stream")
        if data[body_start : body_start + 2] == b"\r\n":
            body_start += 2
        elif data[body_start : body_start + 1] == b"\n":
            body_start += 1
        e = data.find(b"endstream", body_start)
        if e < 0:
            break
        body = data[body_start:e]
        pos = e + len(b"endstream")
        if b"/Image" not in header:
            continue
        try:
            if b"/DCTDecode" in header:
                img = Image.open(io.BytesIO(body))
                if img.mode != "RGB":
                    img = img.convert("RGB")
                out.append(np.asarray(img, dtype=np.uint8))
            elif b"/FlateDecode" in header:
                raw = zlib.decompress(body)
                w = _pdf_int(header, b"/Width")
                h = _pdf_int(header, b"/Height")
                if not w or not h:
                    continue
                if len(raw) >= w * h * 3:
                    arr = np.frombuffer(raw[: w * h * 3], np.uint8).reshape(h, w, 3)
                elif len(raw) >= w * h:
                    g = np.frombuffer(raw[: w * h], np.uint8).reshape(h, w)
                    arr = np.stack([g] * 3, axis=-1)
                else:
                    continue
                out.append(arr.copy())
        except Exception:
            continue
    return out


def _pdf_int(header: bytes, key: bytes) -> int | None:
    i = header.find(key)
    if i < 0:
        return None
    j = i + len(key)
    while j < len(header) and header[j] in b" \t":
        j += 1
    k = j
    while k < len(header) and header[k : k + 1].isdigit():
        k += 1
    return int(header[j:k]) if k > j else None


def pdf_page_count(data: bytes) -> int:
    """Count pages (reference get_pdf_page_count, image_preprocessing.py:297-306)."""
    try:
        import pdf2image  # type: ignore

        return pdf2image.pdfinfo_from_bytes(data)["Pages"]
    except Exception:
        return max(data.count(b"/Type /Page") - data.count(b"/Type /Pages"),
                   data.count(b"/Type/Page") - data.count(b"/Type/Pages"),
                   1)


def rasterize_pdf(data: bytes, dpi: int = 300) -> list[PageImage]:
    """PDF bytes -> page images (reference pdf_to_images,
    image_preprocessing.py:248-295). Tiers: poppler -> first-party renderer
    (engine/pdf.py) -> embedded-image extraction."""
    try:
        import pdf2image  # type: ignore

        pages = pdf2image.convert_from_bytes(data, dpi=dpi)
        return [
            PageImage(np.asarray(p.convert("RGB"), dtype=np.uint8), i + 1, dpi)
            for i, p in enumerate(pages)
        ]
    except Exception:
        pass
    rendered: list[np.ndarray] = []
    try:
        from ocr_system_tpu.engine.pdf import render_pdf

        rendered = render_pdf(data, dpi=dpi)
        # all-blank output usually means the interpreter understood the
        # structure but none of the content (e.g. exotic filters) — prefer
        # embedded-scan salvage THEN, but keep the renders if salvage finds
        # nothing (a genuinely blank/faint PDF is still a valid document)
        if any(int(p.min()) < 250 for p in rendered):
            return [PageImage(img, i + 1, dpi) for i, img in enumerate(rendered)]
    except Exception:
        pass
    images = _pdf_extract_images(data) or rendered
    return [PageImage(img, i + 1, dpi) for i, img in enumerate(images)]


def load_document(data: bytes, filename: str, dpi: int = 300) -> list[PageImage]:
    """Dispatch by extension: PDF -> pages; image -> single page."""
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if ext == "pdf" or data[:5] == b"%PDF-":
        pages = rasterize_pdf(data, dpi)
        if pages:
            return pages
        raise ValueError("PDF contains no rasterizable pages")
    return [PageImage(decode_image(data), 1, dpi)]


def pick_bucket(size: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= size, else the largest bucket."""
    for b in sorted(buckets):
        if size <= b:
            return b
    return max(buckets)
