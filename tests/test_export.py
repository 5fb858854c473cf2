"""Export service tests: xlsx/json/csv/pdf renderers + bulk + gate."""

import io
import json
import zipfile

import pytest

from ocr_system_tpu.db.connection import Database
from ocr_system_tpu.db.crud import Repositories
from ocr_system_tpu.service.export import ExportFormat, ExportService


@pytest.fixture()
def svc(tmp_path, settings):
    db = Database(tmp_path / "e.db")
    s = ExportService(settings, db)
    repos = Repositories(db)
    doc = repos.documents.create(
        filename="doc.png", original_filename="invoice.png",
        file_path="/tmp/x.png", file_size=10, file_type="png",
        status="completed",
    )
    ext = repos.extractions.create_new_version(
        doc["id"], status="completed", form_type="Invoice", language="en",
    )
    repos.fields.bulk_create(
        ext["id"],
        [
            {"field_key": "Invoice Number", "field_value": "12345",
             "field_type": "text", "confidence": 0.95},
            {"field_key": "Total", "field_value": "$99.00",
             "field_type": "currency", "confidence": 0.7},
            {"field_key": "Notes", "field_value": "smudged",
             "field_type": "text", "confidence": 0.2},
        ],
    )
    repos.extractions.update_stats(ext["id"], settings)
    yield s, repos, ext
    db.close()


class TestRenderers:
    def test_json_shape(self, svc):
        s, repos, ext = svc
        res = s.export_extraction(ext["id"], "json")
        assert res.success
        data = json.loads(open(res.file_path, "rb").read())
        assert data["extraction"]["form_type"] == "Invoice"
        assert len(data["fields"]) == 3
        levels = {f["key"]: f["confidence_level"] for f in data["fields"]}
        assert levels == {
            "Invoice Number": "high", "Total": "medium", "Notes": "low",
        }

    def test_csv(self, svc):
        s, _, ext = svc
        res = s.export_extraction(ext["id"], ExportFormat.CSV)
        text = open(res.file_path).read()
        lines = text.strip().splitlines()
        assert len(lines) == 4  # header + 3 fields
        assert lines[0].startswith("field_key,")
        assert "Invoice Number" in lines[1]

    def test_xlsx_valid_zip_with_sheets(self, svc):
        s, _, ext = svc
        res = s.export_extraction(ext["id"], "excel")
        assert res.success and res.filename.endswith(".xlsx")
        z = zipfile.ZipFile(io.BytesIO(open(res.file_path, "rb").read()))
        names = z.namelist()
        assert "xl/workbook.xml" in names
        assert "xl/worksheets/sheet1.xml" in names
        assert "xl/worksheets/sheet2.xml" in names  # metadata sheet
        sheet1 = z.read("xl/worksheets/sheet1.xml").decode()
        assert "Invoice Number" in sheet1
        # confidence-colored cells use style indices
        assert 's="2"' in sheet1 or 's="3"' in sheet1 or 's="4"' in sheet1

    def test_pdf_valid_structure(self, svc):
        s, _, ext = svc
        res = s.export_extraction(ext["id"], "pdf")
        data = open(res.file_path, "rb").read()
        assert data.startswith(b"%PDF-1.4")
        assert b"%%EOF" in data
        assert b"/Type /Page" in data

    def test_unknown_extraction(self, svc):
        s, _, _ = svc
        res = s.export_extraction("missing", "json")
        assert not res.success and "not found" in res.error


class TestValidationGate:
    def test_gate_blocks_invalid(self, svc, settings):
        s, repos, ext = svc
        repos.fields.bulk_create(
            ext["id"],
            [{"field_key": "Email", "field_value": "not-an-email",
              "field_type": "email", "confidence": 0.9}],
        )
        res = s.export_extraction(ext["id"], "json", validate_first=True)
        assert not res.success and "Validation failed" in res.error

    def test_gate_passes_valid(self, svc):
        s, _, ext = svc
        res = s.export_extraction(ext["id"], "json", validate_first=True)
        assert res.success


class TestBulk:
    def test_bulk_excel_sheets(self, svc, settings):
        s, repos, ext = svc
        doc2 = repos.documents.create(
            filename="d2.png", original_filename="receipt.png",
            file_path="/tmp/y.png", file_size=5, file_type="png",
        )
        ext2 = repos.extractions.create_new_version(doc2["id"], status="completed")
        repos.fields.bulk_create(
            ext2["id"],
            [{"field_key": "A", "field_value": "1", "confidence": 0.9}],
        )
        res = s.bulk_export([ext["id"], ext2["id"]], "excel")
        assert res.success
        z = zipfile.ZipFile(io.BytesIO(open(res.file_path, "rb").read()))
        # summary + 2 per-extraction sheets
        sheets = [n for n in z.namelist() if n.startswith("xl/worksheets/")]
        assert len(sheets) == 3

    def test_bulk_csv_concatenated_single_header(self, svc):
        s, repos, ext = svc
        res = s.bulk_export([ext["id"], ext["id"]], "csv")
        text = open(res.file_path).read()
        assert text.count("field_key,field_value") == 1

    def test_bulk_json_array(self, svc):
        s, _, ext = svc
        res = s.bulk_export([ext["id"]], "json")
        data = json.loads(open(res.file_path, "rb").read())
        assert isinstance(data, list) and len(data) == 1

    def test_bulk_pdf_unsupported(self, svc):
        s, _, ext = svc
        res = s.bulk_export([ext["id"]], "pdf")
        assert not res.success
