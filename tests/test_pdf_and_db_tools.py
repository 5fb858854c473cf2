"""Multi-page PDF ingestion + DB migration/bootstrap tooling tests."""

import io

import numpy as np
import pytest
from PIL import Image

from ocr_system_tpu.db.connection import Database
from ocr_system_tpu.db.migrations import CURRENT_VERSION, get_version, migrate
from ocr_system_tpu.engine.preprocess import (
    load_document,
    pdf_page_count,
    rasterize_pdf,
)


def make_image_pdf(pages: list[np.ndarray]) -> bytes:
    """Build a minimal scanned-style PDF: one embedded JPEG per page
    (DCTDecode image XObjects — what scanners emit)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids = []
    # reserve ids: for each page -> image obj, content obj, page obj
    pages_tree_id = 3 * len(pages) + 1
    for i, arr in enumerate(pages):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        jpeg = buf.getvalue()
        h, w = arr.shape[:2]
        img_id = add(
            (
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                f"/Filter /DCTDecode /Length {len(jpeg)} >>\nstream\n"
            ).encode()
            + jpeg
            + b"\nendstream"
        )
        content = f"q {w} 0 0 {h} 0 0 cm /Im{i} Do Q".encode()
        cid = add(
            b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
        )
        pid = add(
            (
                f"<< /Type /Page /Parent {pages_tree_id} 0 R "
                f"/MediaBox [0 0 {w} {h}] "
                f"/Resources << /XObject << /Im{i} {img_id} 0 R >> >> "
                f"/Contents {cid} 0 R >>"
            ).encode()
        )
        page_ids.append(pid)
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    ptid = add(f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode())
    assert ptid == pages_tree_id
    cat = add(f"<< /Type /Catalog /Pages {ptid} 0 R >>".encode())
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, 1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1, cat, xref,
    )
    return bytes(out)


@pytest.fixture()
def two_page_pdf():
    p1 = np.full((120, 100, 3), 255, np.uint8)
    p1[20:40, 10:90] = 0
    p2 = np.full((120, 100, 3), 255, np.uint8)
    p2[60:80, 10:90] = 0
    return make_image_pdf([p1, p2])


class TestPDFIngestion:
    def test_rasterize_two_pages(self, two_page_pdf):
        pages = rasterize_pdf(two_page_pdf, dpi=300)
        assert len(pages) == 2
        assert pages[0].page_number == 1
        assert pages[1].page_number == 2
        # content renderer rasterizes the 100x120pt MediaBox at 300 DPI
        h, w = pages[0].pixels.shape[:2]
        assert abs(h - 120 * 300 / 72) < 2 and abs(w - 100 * 300 / 72) < 2
        # page content differs (dark band position, y-flip-correct placement)
        s = 300 / 72
        assert pages[0].pixels[int(25 * s), int(50 * s), 0] < 100
        assert pages[1].pixels[int(25 * s), int(50 * s), 0] > 200

    def test_page_count(self, two_page_pdf):
        assert pdf_page_count(two_page_pdf) == 2

    def test_load_document_dispatches_pdf(self, two_page_pdf):
        pages = load_document(two_page_pdf, "doc.pdf")
        assert len(pages) == 2

    def test_fake_engine_multipage_contract(self, settings, two_page_pdf):
        from ocr_system_tpu.engine.pipeline import FakeOCREngine

        res = FakeOCREngine(settings, text="A: B").process_document(
            two_page_pdf, "doc.pdf"
        )
        assert res.success and res.total_pages == 2
        assert "## Page 1" in res.combined_markdown
        assert "## Page 2" in res.combined_markdown
        assert {b["page_number"] for b in res.combined_layout_boxes} == {1, 2}


class TestMigrations:
    def test_fresh_db_stamped_current(self, tmp_path):
        db = Database(tmp_path / "m.db")
        assert get_version(db) == 0
        applied = migrate(db)
        assert applied == []
        assert get_version(db) == CURRENT_VERSION
        db.close()

    def test_migrate_idempotent(self, tmp_path):
        db = Database(tmp_path / "m2.db")
        migrate(db)
        assert migrate(db) == []
        db.close()


class TestInitDbScript:
    def test_bootstrap_and_check(self, tmp_path, monkeypatch):
        import subprocess
        import sys

        env = {
            "DATABASE_PATH": str(tmp_path / "boot.db"),
            "STORAGE_ROOT": str(tmp_path / "storage"),
            "JAX_PLATFORMS": "cpu",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        }
        import os

        env = {**os.environ, **env}
        out = subprocess.run(
            [sys.executable, "scripts/init_db.py"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr
        assert "templates seeded" in out.stdout
        check = subprocess.run(
            [sys.executable, "scripts/init_db.py", "--check"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert check.returncode == 0
        assert "ok" in check.stdout


class TestDbAdminScript:
    """scripts/db_admin.py — the sqlite deployment's ops story (reference:
    docker-compose pgadmin profile)."""

    def _run(self, tmp_path, *cmd):
        import os
        import subprocess
        import sys

        env = {
            **os.environ,
            "DATABASE_PATH": str(tmp_path / "admin.db"),
            "STORAGE_ROOT": str(tmp_path / "storage"),
            "JAX_PLATFORMS": "cpu",
        }
        return subprocess.run(
            [sys.executable, "scripts/db_admin.py", *cmd],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )

    def _seed(self, tmp_path):
        import os
        import subprocess
        import sys

        env = {
            **os.environ,
            "DATABASE_PATH": str(tmp_path / "admin.db"),
            "STORAGE_ROOT": str(tmp_path / "storage"),
            "JAX_PLATFORMS": "cpu",
        }
        subprocess.run(
            [sys.executable, "scripts/init_db.py"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )

    def test_tables_and_check(self, tmp_path):
        self._seed(tmp_path)
        out = self._run(tmp_path, "tables")
        assert out.returncode == 0 and "documents" in out.stdout
        chk = self._run(tmp_path, "check")
        assert chk.returncode == 0 and "integrity_check: ok" in chk.stdout

    def test_backup_and_vacuum(self, tmp_path):
        self._seed(tmp_path)
        bk = self._run(tmp_path, "backup", str(tmp_path / "bk.db"))
        assert bk.returncode == 0 and (tmp_path / "bk.db").exists()
        vac = self._run(tmp_path, "vacuum")
        assert vac.returncode == 0 and "vacuum:" in vac.stdout

    def test_sql_is_read_only(self, tmp_path):
        self._seed(tmp_path)
        ok = self._run(tmp_path, "sql", "SELECT COUNT(*) FROM documents")
        assert ok.returncode == 0
        bad = self._run(tmp_path, "sql", "DELETE FROM documents")
        assert bad.returncode != 0
