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


RICH_FIELDS = [
    {"field_key": "Invoice Number", "field_value": "INV-2024-001",
     "confidence": 0.95, "field_type": "number", "is_valid": True,
     "page_number": 1,
     "value_bbox": {"polygon": [140, 96, 260, 96, 260, 120, 140, 120],
                    "page": 1}},
    {"field_key": "Total Amount", "field_value": "$1,234.56",
     "confidence": 0.91, "field_type": "currency", "is_valid": True,
     "page_number": 1},
    {"field_key": "Customer", "field_value": "John Smith",
     "confidence": 0.41, "field_type": "name", "is_edited": True,
     "original_value": "Jhn Smth", "page_number": 2,
     "value_bbox": {"polygon": [80, 40, 200, 40, 200, 60, 80, 60],
                    "page": 2}},
    {"field_key": "Due Date", "field_value": "2024-01-15",
     "confidence": 0.88, "field_type": "date", "page_number": 2},
    {"field_key": "Date", "field_value": "2024-01-01",
     "confidence": 0.82, "field_type": "date", "page_number": 1},
    {"field_key": "Date", "field_value": "2024-01-02",
     "confidence": 0.64, "field_type": "date", "is_valid": False,
     "validation_message": "ambiguous day/month", "page_number": 1},
]

LAYOUT = [
    {"type": "line", "content": "PO Number:", "confidence": 0.93,
     "polygon": [100, 300, 190, 300, 190, 320, 100, 320], "page_number": 1},
    {"type": "line", "content": "7712", "confidence": 0.9,
     "polygon": [205, 300, 250, 300, 250, 320, 205, 320], "page_number": 1},
    {"type": "line", "content": "Reference: AB-99", "confidence": 0.9,
     "polygon": [100, 350, 300, 350, 300, 370, 100, 370], "page_number": 1},
]


def make_rich_chat():
    return ExtractionChat(
        fields=[dict(f) for f in RICH_FIELDS], ocr_text=OCR,
        layout_boxes=[dict(b) for b in LAYOUT],
    )


class TestConversation:
    """VERDICT r3 item 7: multi-turn follow-up, aggregation, reconciliation."""

    def test_followup_confidence(self):
        c = make_rich_chat()
        c.send("what is the invoice number?")
        out = c.send("and its confidence?")
        assert "95%" in out["reply"]
        assert out["matched_fields"] == ["Invoice Number"]

    def test_followup_page_and_location(self):
        c = make_rich_chat()
        c.send("what is the customer?")
        out = c.send("what page is it on?")
        assert "page 2" in out["reply"]
        out = c.send("where is it?")
        assert "near (80, 40)" in out["reply"]

    def test_followup_original_value(self):
        c = make_rich_chat()
        c.send("customer?")
        out = c.send("was it edited?")
        assert "Jhn Smth" in out["reply"] and "John Smith" in out["reply"]

    def test_focus_survives_listing(self):
        # a multi-field listing must not steal the single-field focus
        c = make_rich_chat()
        c.send("what is the total amount?")
        c.send("list fields")
        out = c.send("and its confidence?")
        assert "91%" in out["reply"]

    def test_aggregation_low_confidence_on_page(self):
        c = make_rich_chat()
        out = c.send("which fields are low confidence on page 2")
        assert "Customer" in out["reply"]
        assert "Due Date" not in out["reply"]  # 0.88, above threshold

    def test_aggregation_threshold(self):
        out = make_rich_chat().send("which fields are below 90%?")
        for k in ("Customer", "Due Date", "Date"):
            assert k in out["reply"]
        assert "Invoice Number" not in out["reply"]

    def test_count_and_average(self):
        c = make_rich_chat()
        assert "6 field(s)" in c.send("how many fields are there?")["reply"]
        assert "4 field(s) on page 1" in (
            c.send("how many fields on page 1?")["reply"])
        out = c.send("what is the average confidence?")
        assert "%" in out["reply"] and "Customer" in out["reply"]

    def test_reconcile_conflicting_fields(self):
        out = make_rich_chat().send("the dates conflict - which is right?")
        assert "2 conflicting values" in out["reply"]
        assert "2024-01-01" in out["reply"] and "2024-01-02" in out["reply"]
        # the invalid one loses; the valid-by-default higher-conf one wins
        assert "Recommend '2024-01-01'" in out["reply"]

    def test_reconcile_no_conflict_reports_edits(self):
        out = make_rich_chat().send("reconcile the customer")
        assert "Jhn Smth" in out["reply"]  # edit-vs-OCR divergence surfaced

    def test_citation_on_lookup(self):
        out = make_rich_chat().send("what is the invoice number?")
        assert "(page 1, near (140, 96))" in out["reply"]

    def test_requery_layout_neighbor(self):
        # 'PO number' was never extracted: re-query finds the label box and
        # pairs its right-neighbor as candidate value
        out = make_rich_chat().send("what about the PO number?")
        assert "PO Number" in out["reply"]
        assert "7712" in out["reply"]
        assert "candidate" in out["reply"]

    def test_requery_inline_colon(self):
        out = make_rich_chat().send("find the reference")
        assert "AB-99" in out["reply"]

    def test_history_roundtrip_restores_focus(self):
        # stateless serving: a NEW chat built from the returned history
        # resolves the same follow-up
        c1 = make_rich_chat()
        c1.send("what is the invoice number?")
        c2 = ExtractionChat(
            fields=[dict(f) for f in RICH_FIELDS], ocr_text=OCR,
            history=list(c1.history),
        )
        out = c2.send("and its confidence?")
        assert "95%" in out["reply"]


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
