"""Extraction chat tests (reference: gemini_service.py:584-604
create_extraction_chat; here grounded + route-exposed)."""

from ocr_system_tpu.extract.chat import ExtractionChat


FIELDS = [
    {"field_key": "Invoice Number", "field_value": "INV-2024-001",
     "confidence": 0.95, "field_type": "number"},
    {"field_key": "Total Amount", "field_value": "$1,234.56",
     "confidence": 0.91, "field_type": "currency"},
    {"field_key": "Customer", "field_value": "Jhn Smth",
     "confidence": 0.41, "field_type": "name"},
]
OCR = "INVOICE\nInvoice Number INV-2024-001\nTotal Amount $1,234.56\nCustomer Jhn Smth"


def make_chat():
    return ExtractionChat(fields=[dict(f) for f in FIELDS], ocr_text=OCR)


class TestIntents:
    def test_field_lookup(self):
        out = make_chat().send("what is the invoice number?")
        assert "INV-2024-001" in out["reply"]
        assert out["matched_fields"] == ["Invoice Number"]

    def test_partial_key_lookup(self):
        out = make_chat().send("total?")
        assert "$1,234.56" in out["reply"]

    def test_list_fields(self):
        out = make_chat().send("list fields")
        assert "3 field(s)" in out["reply"]
        assert len(out["matched_fields"]) == 3

    def test_uncertain(self):
        out = make_chat().send("which fields are uncertain?")
        assert "Customer" in out["reply"]
        assert out["matched_fields"] == ["Customer"]

    def test_text_search(self):
        out = make_chat().send("find Smth")
        assert "Jhn Smth" in out["reply"]

    def test_no_match(self):
        out = make_chat().send("find zebra unicorns")
        assert "No OCR line" in out["reply"]

    def test_multiturn_history(self):
        c = make_chat()
        c.send("list fields")
        c.send("what is the total amount?")
        assert len(c.history) == 4
        assert c.history[0].role == "user"
        assert c.history[-1].role == "assistant"


class TestRoute:
    def test_chat_route(self, tmp_path, settings, form_png):
        import asyncio
        import json

        from ocr_system_tpu.api.app import ApiContext, create_app
        from ocr_system_tpu.api.http import Request
        from ocr_system_tpu.db.connection import Database
        from ocr_system_tpu.engine.pipeline import FakeOCREngine
        from ocr_system_tpu.extract.rules import RuleExtractor
        from ocr_system_tpu.service.orchestrator import ExtractionOrchestrator

        db = Database(tmp_path / "chat.db")
        orch = ExtractionOrchestrator(
            settings=settings, db=db,
            engine=FakeOCREngine(settings, text="Name: John Smith"),
            extractor=RuleExtractor(),
        )
        app = create_app(ApiContext(settings=settings, db=db,
                                    orchestrator=orch))

        def call(method, path, body=b"", headers=None):
            req = Request(method=method, path=path, query={},
                          headers=headers or {}, body=body,
                          client_ip="127.0.0.1")

            async def go():
                resp, bg = await app.handle(req)
                await bg.run()
                return resp

            return asyncio.run(go())

        boundary = "testboundary123"
        body = (
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
            f'filename="form.png"\r\nContent-Type: image/png\r\n\r\n'.encode()
            + form_png + f"\r\n--{boundary}--\r\n".encode()
        )
        up = call("POST", "/api/documents/upload", body=body, headers={
            "content-type": f"multipart/form-data; boundary={boundary}"
        })
        assert up.status == 201
        doc = json.loads(up.body)
        r = call("GET", f"/api/extractions/document/{doc['id']}")
        assert r.status == 200
        ext = json.loads(r.body)

        jhdr = {"content-type": "application/json"}
        r = call("POST", f"/api/extractions/{ext['id']}/chat",
                 json.dumps({"message": "what is the name?"}).encode(), jhdr)
        assert r.status == 200
        out = json.loads(r.body)
        assert "John Smith" in out["reply"]
        assert out["history"][-1]["role"] == "assistant"
        # multi-turn: feed history back
        r2 = call("POST", f"/api/extractions/{ext['id']}/chat",
                  json.dumps({"message": "list fields",
                              "history": out["history"]}).encode(), jhdr)
        assert len(json.loads(r2.body)["history"]) == 4
        # missing message -> 422
        r3 = call("POST", f"/api/extractions/{ext['id']}/chat",
                  json.dumps({}).encode(), jhdr)
        assert r3.status == 422
        db.close()
