"""REST API tests — route tree parity with the reference backend.

Uses an in-process test client over App.handle (no socket), with the fake
OCR engine + rule extractor so no model compiles.
"""

import asyncio
import json

import pytest

from ocr_system_tpu.api.app import ApiContext, create_app
from ocr_system_tpu.api.http import Request
from ocr_system_tpu.db.connection import Database
from ocr_system_tpu.engine.pipeline import FakeOCREngine
from ocr_system_tpu.extract.rules import RuleExtractor
from ocr_system_tpu.service.orchestrator import ExtractionOrchestrator


class Client:
    def __init__(self, app):
        self.app = app

    def request(self, method, path, body=b"", headers=None, run_bg=True):
        query = {}
        if "?" in path:
            from urllib.parse import parse_qs

            path, qs = path.split("?", 1)
            query = {k: v[0] for k, v in parse_qs(qs, keep_blank_values=True).items()}
        req = Request(
            method=method, path=path, query=query,
            headers=headers or {}, body=body, client_ip="127.0.0.1",
        )

        async def go():
            resp, bg = await self.app.handle(req)
            if run_bg:
                await bg.run()
            return resp

        return asyncio.run(go())

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post_json(self, path, data, **kw):
        return self.request(
            "POST", path, body=json.dumps(data).encode(),
            headers={"content-type": "application/json"}, **kw,
        )

    def patch_json(self, path, data, **kw):
        return self.request(
            "PATCH", path, body=json.dumps(data).encode(),
            headers={"content-type": "application/json"}, **kw,
        )

    def delete(self, path, **kw):
        return self.request("DELETE", path, **kw)

    def upload(self, path, filename, data, extra_fields=None, **kw):
        boundary = "testboundary123"
        parts = []
        for k, v in (extra_fields or {}).items():
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
                f"\r\n\r\n{v}\r\n".encode()
            )
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
            f'filename="{filename}"\r\nContent-Type: image/png\r\n\r\n'.encode()
            + data
            + b"\r\n"
        )
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        return self.request(
            "POST", path, body=body,
            headers={"content-type": f"multipart/form-data; boundary={boundary}"},
            **kw,
        )


def body_json(resp):
    return json.loads(resp.body)


@pytest.fixture()
def client(tmp_path, settings):
    db = Database(tmp_path / "api.db")
    orch = ExtractionOrchestrator(
        settings=settings, db=db,
        engine=FakeOCREngine(settings, text="Name: John Smith"),
        extractor=RuleExtractor(),
    )
    ctx = ApiContext(settings=settings, db=db, orchestrator=orch)
    app = create_app(ctx)
    yield Client(app)
    db.close()


@pytest.fixture()
def uploaded(client, form_png):
    resp = client.upload("/api/documents/upload", "form.png", form_png)
    assert resp.status == 201
    return body_json(resp)


class TestRootHealth:
    def test_root(self, client):
        resp = client.get("/")
        assert resp.status == 200
        assert body_json(resp)["status"] == "running"

    def test_health_components(self, client):
        resp = client.get("/health")
        data = body_json(resp)
        assert resp.status == 200
        assert data["components"] == {
            "database": "ok", "storage": "ok", "ocr_engine": "ok",
        }

    def test_api_info(self, client):
        data = body_json(client.get("/api"))
        assert "documents" in data["endpoints"]

    def test_404(self, client):
        resp = client.get("/api/nonexistent")
        assert resp.status == 404
        assert "detail" in body_json(resp)

    def test_405(self, client):
        resp = client.delete("/health")
        assert resp.status == 405

    def test_timing_header(self, client):
        resp = client.get("/")
        assert "X-Process-Time" in resp.headers


class TestDocuments:
    def test_upload_and_auto_extract(self, client, uploaded):
        assert uploaded["status_display"] in ("Pending", "Completed")
        assert uploaded["auto_extract"] is True
        # background task already ran (test client runs bg inline)
        doc = body_json(client.get(f"/api/documents/{uploaded['id']}"))
        assert doc["status"] == "completed"
        assert len(doc["extractions"]) == 1

    def test_upload_no_auto_extract(self, client, form_png):
        resp = client.upload(
            "/api/documents/upload", "x.png", form_png,
            extra_fields={"auto_extract": "false"},
        )
        data = body_json(resp)
        assert data["auto_extract"] is False
        doc = body_json(client.get(f"/api/documents/{data['id']}"))
        assert doc["status"] == "pending"

    def test_upload_bad_extension(self, client):
        resp = client.upload("/api/documents/upload", "evil.exe", b"MZ")
        assert resp.status == 400

    def test_upload_missing_file(self, client):
        resp = client.request(
            "POST", "/api/documents/upload", body=b"{}",
            headers={"content-type": "application/json"},
        )
        assert resp.status == 422

    def test_list_and_search(self, client, uploaded):
        data = body_json(client.get("/api/documents?search=form"))
        assert data["total"] == 1
        data = body_json(client.get("/api/documents?search=zzz"))
        assert data["total"] == 0

    def test_file_size_human(self, client, uploaded):
        assert "KB" in uploaded["file_size_human"] or "B" in uploaded["file_size_human"]

    def test_soft_delete(self, client, uploaded):
        resp = client.delete(f"/api/documents/{uploaded['id']}")
        assert resp.status == 200
        assert client.get(f"/api/documents/{uploaded['id']}").status == 404

    def test_processed_image_served(self, client, uploaded):
        resp = client.get(f"/api/documents/{uploaded['id']}/processed-image/1")
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/jpeg"
        assert resp.body[:2] == b"\xff\xd8"  # JPEG magic

    def test_processed_image_missing_page(self, client, uploaded):
        assert client.get(
            f"/api/documents/{uploaded['id']}/processed-image/99"
        ).status == 404


class TestExtractions:
    def _extraction_id(self, client, uploaded):
        doc = body_json(client.get(f"/api/documents/{uploaded['id']}"))
        return doc["extractions"][0]["id"]

    def test_get_extraction_with_layout(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        data = body_json(client.get(f"/api/extractions/{eid}"))
        assert data["status"] == "completed"
        assert data["layout_data"]
        assert data["page_dimensions"]["1"]["width"] == 600
        assert data["fields"]
        f = data["fields"][0]
        assert {"confidence_level", "confidence_percent", "confidence_icon"} <= set(f)

    def test_status_poll(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        data = body_json(client.get(f"/api/extractions/{eid}/status"))
        assert data["status"] == "completed"

    def test_reextract_conflict_while_processing(self, client, uploaded):
        # first start (don't run bg) -> processing; second start -> 409
        resp = client.post_json(
            f"/api/extractions/{uploaded['id']}", {}, run_bg=False
        )
        assert resp.status == 202
        resp2 = client.post_json(f"/api/extractions/{uploaded['id']}", {})
        assert resp2.status == 409

    def test_field_edit_flow(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        data = body_json(client.get(f"/api/extractions/{eid}"))
        fid = data["fields"][0]["id"]
        resp = client.patch_json(
            f"/api/extractions/{eid}/fields/{fid}", {"field_value": "Jane Doe"}
        )
        out = body_json(resp)
        assert out["field_value"] == "Jane Doe"
        assert out["is_edited"] is True
        assert out["original_value"] == "John Smith"

    def test_field_edit_missing_value(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        data = body_json(client.get(f"/api/extractions/{eid}"))
        fid = data["fields"][0]["id"]
        resp = client.patch_json(f"/api/extractions/{eid}/fields/{fid}", {})
        assert resp.status == 422

    def test_field_reviewer_valid_checkbox(self, client, uploaded):
        """PATCH {is_valid} is the reviewer-verdict checkbox (reference
        premium_fields.py): it flips validity + needs_review without
        touching the value."""
        eid = self._extraction_id(client, uploaded)
        data = body_json(client.get(f"/api/extractions/{eid}"))
        f0 = data["fields"][0]
        out = body_json(client.patch_json(
            f"/api/extractions/{eid}/fields/{f0['id']}", {"is_valid": True}
        ))
        assert out["is_valid"] in (True, 1)
        assert out["needs_review"] in (False, 0)
        assert out["field_value"] == f0["field_value"]  # value untouched
        out = body_json(client.patch_json(
            f"/api/extractions/{eid}/fields/{f0['id']}", {"is_valid": False}
        ))
        assert out["is_valid"] in (False, 0)
        assert out["needs_review"] in (True, 1)

    def test_validate_endpoint(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        data = body_json(client.post_json(f"/api/extractions/{eid}/validate", {}))
        assert data["total_fields"] >= 1

    def test_finalize_requires_confirm(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        assert client.post_json(
            f"/api/extractions/{eid}/finalize", {}
        ).status == 422
        out = body_json(
            client.post_json(f"/api/extractions/{eid}/finalize", {"confirm": True})
        )
        assert out["is_finalized"] is True

    def test_finalized_blocks_edits(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        client.post_json(f"/api/extractions/{eid}/finalize", {"confirm": True})
        data = body_json(client.get(f"/api/extractions/{eid}"))
        fid = data["fields"][0]["id"]
        resp = client.patch_json(
            f"/api/extractions/{eid}/fields/{fid}", {"field_value": "x"}
        )
        assert resp.status == 409

    def test_delete_extraction(self, client, uploaded):
        eid = self._extraction_id(client, uploaded)
        assert client.delete(f"/api/extractions/{eid}").status == 200
        assert client.get(f"/api/extractions/{eid}").status == 404

    def test_template_driven_extraction(self, client, form_png):
        resp = client.upload(
            "/api/documents/upload", "y.png", form_png,
            extra_fields={"auto_extract": "false"},
        )
        doc_id = body_json(resp)["id"]
        resp = client.post_json(
            f"/api/extractions/{doc_id}", {"template_name": "Application Form"}
        )
        assert resp.status == 202
        doc = body_json(client.get(f"/api/documents/{doc_id}"))
        eid = doc["extractions"][0]["id"]
        data = body_json(client.get(f"/api/extractions/{eid}"))
        keys = {f["field_key"] for f in data["fields"]}
        # template expected fields appear (empty if not found on the page)
        assert "Full Name" in keys

    def test_unknown_template_404(self, client, uploaded):
        resp = client.post_json(
            f"/api/extractions/{uploaded['id']}", {"template_name": "Nope"}
        )
        assert resp.status == 404

    def test_template_at_upload(self, client, form_png):
        """Reference upload_zone.py:30-77: template picked at upload time
        drives the auto-extraction."""
        resp = client.upload(
            "/api/documents/upload", "t.png", form_png,
            extra_fields={"template_name": "Application Form"},
        )
        assert resp.status == 201
        doc_id = body_json(resp)["id"]
        doc = body_json(client.get(f"/api/documents/{doc_id}"))
        eid = doc["extractions"][0]["id"]
        data = body_json(client.get(f"/api/extractions/{eid}"))
        keys = {f["field_key"] for f in data["fields"]}
        assert "Full Name" in keys

    def test_template_at_upload_unknown_404(self, client, form_png):
        resp = client.upload(
            "/api/documents/upload", "t.png", form_png,
            extra_fields={"template_name": "Nope"},
        )
        assert resp.status == 404

    def test_add_field(self, client, uploaded):
        doc = body_json(client.get(f"/api/documents/{uploaded['id']}"))
        eid = doc["extractions"][0]["id"]
        before = body_json(client.get(f"/api/extractions/{eid}"))
        resp = client.post_json(
            f"/api/extractions/{eid}/fields",
            {"field_key": "PO Number", "field_value": "PO-77",
             "field_type": "number"},
        )
        assert resp.status == 201
        f = body_json(resp)
        assert f["field_key"] == "PO Number" and f["is_edited"]
        after = body_json(client.get(f"/api/extractions/{eid}"))
        assert after["total_fields"] == before["total_fields"] + 1
        assert any(
            x["field_key"] == "PO Number" and x["field_value"] == "PO-77"
            for x in after["fields"]
        )

    def test_add_field_requires_key(self, client, uploaded):
        doc = body_json(client.get(f"/api/documents/{uploaded['id']}"))
        eid = doc["extractions"][0]["id"]
        resp = client.post_json(f"/api/extractions/{eid}/fields", {})
        assert resp.status == 422

    def test_add_field_blocked_when_finalized(self, client, uploaded):
        doc = body_json(client.get(f"/api/documents/{uploaded['id']}"))
        eid = doc["extractions"][0]["id"]
        client.post_json(f"/api/extractions/{eid}/finalize", {"confirm": True})
        resp = client.post_json(
            f"/api/extractions/{eid}/fields", {"field_key": "X"}
        )
        assert resp.status == 409


class TestExports:
    def _eid(self, client, uploaded):
        doc = body_json(client.get(f"/api/documents/{uploaded['id']}"))
        return doc["extractions"][0]["id"]

    def test_create_and_download(self, client, uploaded):
        eid = self._eid(client, uploaded)
        rec = body_json(
            client.post_json(
                "/api/exports", {"extraction_id": eid, "format": "json"}
            )
        )
        assert rec["status"] == "completed"
        info = body_json(client.get(f"/api/exports/{rec['id']}"))
        assert info["format"] == "json"
        dl = client.get(f"/api/exports/{rec['id']}/download")
        assert dl.status == 200
        assert json.loads(dl.body)["fields"]

    def test_quick_export_all_formats(self, client, uploaded):
        eid = self._eid(client, uploaded)
        for fmt, magic in [
            ("json", b"{"), ("csv", b"field_key"),
            ("excel", b"PK"), ("pdf", b"%PDF"),
        ]:
            resp = client.get(f"/api/exports/extraction/{eid}/{fmt}")
            assert resp.status == 200, fmt
            assert resp.body.startswith(magic), fmt

    def test_bad_format(self, client, uploaded):
        eid = self._eid(client, uploaded)
        assert client.get(f"/api/exports/extraction/{eid}/docx").status == 422


class TestStatsAndTemplates:
    def test_dashboard(self, client, uploaded):
        data = body_json(client.get("/api/stats/dashboard"))
        assert data["documents"]["total"] == 1
        assert data["extractions"]["completed"] == 1
        assert data["fields"]["total"] >= 1

    def test_documents_stats(self, client, uploaded):
        data = body_json(client.get("/api/stats/documents"))
        assert data["by_file_type"] == {"png": 1}

    def test_extraction_stats(self, client, uploaded):
        data = body_json(client.get("/api/stats/extractions"))
        assert sum(data["confidence_distribution"].values()) >= 1

    def test_processing_stats(self, client, uploaded):
        data = body_json(client.get("/api/stats/processing"))
        assert "ocr" in data["steps"]
        assert data["steps"]["ocr"]["completed"] == 1

    def test_overview(self, client, uploaded):
        data = body_json(client.get("/api/stats/overview"))
        assert data["totals"]["documents"] == 1
        assert data["engine"]["available"]

    def test_templates_seeded(self, client):
        data = body_json(client.get("/api/templates"))
        names = {t["name"] for t in data["items"]}
        assert {"General Form", "Invoice", "Application Form"} <= names


def test_devices_endpoint(client):
    resp = client.get("/api/stats/devices")
    assert resp.status == 200
    data = body_json(resp)
    assert data["devices"] and "device" in data["devices"][0]


class TestAdviceRegressions:
    def test_multipart_binary_payload_preserved(self):
        """RFC 2046: only the single delimiter CRLF is removed — payloads
        that legitimately start/end with CR/LF bytes survive intact."""
        payload = b"\r\n\x00\x01BINARY\r\ndata\x0d\x0a"
        boundary = "bnd42"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; filename="x.bin"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n".encode()
            + payload
            + f"\r\n--{boundary}--\r\n".encode()
        )
        req = Request(
            method="POST", path="/x", query={}, body=body,
            headers={
                "content-type": f"multipart/form-data; boundary={boundary}"
            },
        )
        fields, files = req.form()
        assert files["file"].data == payload

    def test_multipart_fields_and_file_mix(self):
        boundary = "bnd43"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="note"\r\n\r\n'
            "hello\r\n".encode()
            + f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="f"; filename="a.txt"\r\n'
            "\r\nabc\r\n".encode()
            + f"--{boundary}--\r\n".encode()
        )
        req = Request(
            method="POST", path="/x", query={}, body=body,
            headers={
                "content-type": f"multipart/form-data; boundary={boundary}"
            },
        )
        fields, files = req.form()
        assert fields["note"] == "hello"
        assert files["f"].data == b"abc"

    def test_delete_current_extraction_promotes_previous(
        self, client, uploaded
    ):
        doc_id = uploaded["id"]
        # two versions exist after a re-extract
        resp = client.post_json(f"/api/extractions/{doc_id}", {})
        assert resp.status in (200, 202)
        cur = body_json(client.get(f"/api/extractions/document/{doc_id}"))
        assert cur["version"] >= 2
        resp = client.delete(f"/api/extractions/{cur['id']}")
        assert resp.status == 200
        # previous version was promoted — document endpoint still serves one
        prev = body_json(client.get(f"/api/extractions/document/{doc_id}"))
        assert prev["id"] != cur["id"]
        assert prev["is_current"] in (1, True)

    def test_xff_ignored_without_trusted_proxy(self):
        import asyncio

        from ocr_system_tpu.api.http import _read_request

        raw = (
            b"GET / HTTP/1.1\r\nHost: x\r\n"
            b"X-Forwarded-For: 9.9.9.9\r\n\r\n"
        )

        async def go(trust):
            reader = asyncio.StreamReader()
            reader.feed_data(raw)
            reader.feed_eof()
            return await _read_request(reader, "10.0.0.1", trust)

        req = asyncio.run(go(False))
        assert req.client_ip == "10.0.0.1"  # header NOT trusted
        req = asyncio.run(go(True))
        assert req.client_ip == "9.9.9.9"  # trusted proxy path

    def test_engine_singleton_thread_safe(self, settings):
        import threading

        from ocr_system_tpu.engine import pipeline as P

        P._ENGINE_SINGLETON.clear()
        built = []
        orig = P._build_engine

        def slow_build(key, s):
            import time

            time.sleep(0.05)
            e = orig(key, s)
            built.append(e)
            return e

        P._build_engine = slow_build
        try:
            results = []
            threads = [
                threading.Thread(
                    target=lambda: results.append(P.get_engine(settings))
                )
                for _ in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert len(built) == 1  # single construction
            assert all(r is results[0] for r in results)
        finally:
            P._build_engine = orig
            P._ENGINE_SINGLETON.clear()


@pytest.mark.slow
class TestLayoutModelExtractionE2E:
    """VERDICT r1 #1 done-when: an HTTP upload extracts via the TRAINED
    layout model (extraction_method=auto + checkpoints/extract)."""

    def test_upload_extracts_via_layout_model(self, tmp_path, settings, form_png):
        import os

        if not os.path.isdir("checkpoints/extract"):
            pytest.skip("no trained extract checkpoint in this clone")
        from ocr_system_tpu.extract.layout_model import get_extractor

        s = settings.model_copy(update={
            "extraction_method": "auto",
            "extract_checkpoint": "checkpoints/extract",
        })
        extractor = get_extractor(s)
        assert type(extractor).__name__ == "LayoutModelExtractor"
        db = Database(tmp_path / "lm.db")
        orch = ExtractionOrchestrator(
            settings=s, db=db,
            engine=FakeOCREngine(s, text="Invoice Number: INV-2024-001"),
            extractor=extractor,
        )
        ctx = ApiContext(settings=s, db=db, orchestrator=orch)
        client = Client(create_app(ctx))
        resp = client.upload("/api/documents/upload", "inv.png", form_png)
        assert resp.status == 201
        doc_id = body_json(resp)["id"]
        doc = body_json(client.get(f"/api/documents/{doc_id}"))
        assert doc["extractions"], "auto-extraction did not run"
        data = body_json(
            client.get(f"/api/extractions/{doc['extractions'][0]['id']}")
        )
        assert data["status"] == "completed"
        assert data["model_name"] == "layout_model"
        db.close()


class TestUploadTemplateAtomicity:
    def test_unknown_template_leaves_no_orphan(self, client, form_png):
        before = body_json(client.get("/api/documents"))["total"]
        resp = client.upload(
            "/api/documents/upload", "t.png", form_png,
            extra_fields={"template_name": "Nope"},
        )
        assert resp.status == 404
        after = body_json(client.get("/api/documents"))["total"]
        assert after == before, "404 upload must not persist a document"

    def test_no_auto_extract_skips_usage_increment(self, client, form_png):
        t0 = next(
            t for t in body_json(client.get("/api/templates"))["items"]
            if t["name"] == "Application Form"
        )
        resp = client.upload(
            "/api/documents/upload", "t.png", form_png,
            extra_fields={"template_name": "Application Form",
                          "auto_extract": "false"},
        )
        assert resp.status == 201
        t1 = next(
            t for t in body_json(client.get("/api/templates"))["items"]
            if t["name"] == "Application Form"
        )
        assert t1["usage_count"] == t0["usage_count"]
