"""First-party PDF rasterizer (engine/pdf.py) tests.

Fixtures are hand-assembled PDFs (raw syntax) — independent of the renderer
under test — plus a matplotlib-generated vector PDF as an adversarial
real-world sample (embedded Type1 fonts, compressed streams, its own
operator mix).
"""

import io
import zlib

import numpy as np
import pytest

from ocr_system_tpu.engine.pdf import (
    PdfDocument,
    PdfError,
    Ref,
    parse_object,
    render_pdf,
)
from ocr_system_tpu.engine.preprocess import load_document


def _build_pdf(objects: list[bytes]) -> bytes:
    """Assemble numbered objects (1..n) into a classic-xref PDF."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


def _stream_obj(sdict: bytes, payload: bytes) -> bytes:
    return sdict + b"\nstream\n" + payload + b"\nendstream"


def text_pdf(compress: bool = False) -> bytes:
    content = (
        b"BT /F1 24 Tf 72 700 Td (INVOICE 2024-001) Tj ET\n"
        b"BT /F1 14 Tf 72 650 Td (Total Amount: $1,234.56) Tj ET\n"
        b"BT /F1 14 Tf 72 620 Td [(Customer:) -500 (Jane Doe)] TJ ET\n"
        b"1 w 70 600 m 400 600 l S\n"
        b"0.8 g 70 520 200 40 re f\n"
    )
    if compress:
        body = zlib.compress(content)
        stream = _stream_obj(
            b"<< /Length %d /Filter /FlateDecode >>" % len(body), body
        )
    else:
        stream = _stream_obj(b"<< /Length %d >>" % len(content), content)
    return _build_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            stream,
        ]
    )


def scanned_pdf() -> bytes:
    """A page whose content is one embedded JPEG placed via cm+Do."""
    from PIL import Image

    img = Image.new("L", (200, 100), 255)
    for x in range(20, 180):
        img.putpixel((x, 50), 0)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    jpeg = buf.getvalue()
    content = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
    return _build_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>",
            _stream_obj(
                b"<< /Type /XObject /Subtype /Image /Width 200 /Height 100 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                b"/Filter /DCTDecode /Length %d >>" % len(jpeg),
                jpeg,
            ),
            _stream_obj(b"<< /Length %d >>" % len(content), content),
        ]
    )


class TestParser:
    def test_scalars_and_refs(self):
        v, _ = parse_object(b"<< /A 1 /B 2.5 /C (hi) /D [1 2 R 3] /E /Nm >>", 0)
        assert v["A"] == 1 and v["B"] == 2.5 and v["C"] == b"hi"
        assert v["D"][0] == Ref((1, 2)) and v["D"][1] == 3
        assert str(v["E"]) == "Nm"

    def test_string_escapes(self):
        v, _ = parse_object(rb"(a\(b\)c\\d\101)", 0)
        assert v == b"a(b)c\\dA"

    def test_hex_string(self):
        v, _ = parse_object(b"<48656C6C6F>", 0)
        assert v == b"Hello"

    def test_bad_object_raises(self):
        with pytest.raises(PdfError):
            parse_object(b"}}}", 0)


class TestDocument:
    def test_page_walk(self):
        doc = PdfDocument(text_pdf())
        pages = doc.pages()
        assert len(pages) == 1
        assert doc.resolve(pages[0]["MediaBox"])[2] == 612

    def test_render_no_pages(self):
        with pytest.raises(PdfError):
            render_pdf(b"%PDF-1.4\nnothing here")


class TestTextRender:
    @pytest.mark.parametrize("compress", [False, True])
    def test_text_page_renders_ink(self, compress):
        pages = render_pdf(text_pdf(compress), dpi=150)
        assert len(pages) == 1
        page = pages[0]
        # 612x792pt at 150dpi
        assert page.shape == (1650, 1275, 3)
        ink = (page[..., 0] < 128).sum()
        assert ink > 500, "text+rule should leave ink on the page"
        # text is in the TOP quarter (y-flip correctness): 700pt from bottom
        top = (page[: page.shape[0] // 4, :, 0] < 128).sum()
        assert top > 0.5 * ink * 0.3

    def test_text_position_scale(self):
        """'INVOICE' baseline at (72, 700)pt -> x=150px y=(792-700)*dpi/72."""
        pages = render_pdf(text_pdf(), dpi=150)
        g = pages[0][..., 0]
        ys, xs = np.nonzero(g < 128)
        # leftmost ink at ~72pt * 150/72 = 150px (+-20)
        assert abs(xs.min() - 150) < 25
        # topmost ink near y = (792-700-24)*150/72 ~ 141
        assert abs(ys.min() - 141) < 40

    def test_scanned_page_places_image(self):
        pages = render_pdf(scanned_pdf(), dpi=72)
        assert pages[0].shape == (792, 612, 3)
        assert (pages[0][..., 0] < 100).sum() > 100  # the black bar

    def test_load_document_text_pdf(self):
        out = load_document(text_pdf(True), "doc.pdf", dpi=150)
        assert len(out) == 1
        assert out[0].pixels.shape[2] == 3
        assert (out[0].pixels[..., 0] < 128).sum() > 500


@pytest.mark.slow
class TestMatplotlibPdf:
    def test_real_generator_parses_and_renders(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8.5, 11))
        ax.text(0.1, 0.9, "Quarterly Report", fontsize=24)
        ax.text(0.1, 0.8, "Revenue: $50,000", fontsize=14)
        ax.plot([0.1, 0.9], [0.75, 0.75], "k-")
        ax.axis("off")
        buf = io.BytesIO()
        fig.savefig(buf, format="pdf")
        plt.close(fig)
        pages = render_pdf(buf.getvalue(), dpi=100)
        assert len(pages) == 1
        assert pages[0].shape[0] > 500
        # mpl embeds Type1 fonts w/ custom encodings; we require ink, not
        # perfect glyph mapping
        assert (pages[0][..., 0] < 200).sum() > 50


class TestEndToEndUpload:
    def test_pdf_to_extracted_fields(self, settings):
        """VERDICT #5 done-when: a vector-text PDF round-trips through the
        upload pipeline to extracted fields (fake engine supplies OCR; the
        decode tier under test is the PDF rasterizer)."""
        from ocr_system_tpu.engine.pipeline import FakeOCREngine

        res = FakeOCREngine(settings).process_document(text_pdf(True), "a.pdf")
        assert res.success and res.total_pages == 1
