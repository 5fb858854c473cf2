"""Workflow orchestration tests (parity: extraction_service.py workflow)."""

import pytest

from ocr_system_tpu.db.connection import Database
from ocr_system_tpu.engine.pipeline import FakeOCREngine
from ocr_system_tpu.extract.rules import RuleExtractor
from ocr_system_tpu.service.orchestrator import ExtractionOrchestrator


@pytest.fixture()
def orch(tmp_path, settings, form_png):
    db = Database(tmp_path / "o.db")
    o = ExtractionOrchestrator(
        settings=settings,
        db=db,
        engine=FakeOCREngine(settings, text="Name: John Smith"),
        extractor=RuleExtractor(),
    )
    # register an uploaded document
    path = tmp_path / "form.png"
    path.write_bytes(form_png)
    doc = o.repos.documents.create(
        filename="doc_1.png",
        original_filename="form.png",
        file_path=str(path),
        file_size=len(form_png),
        file_type="png",
    )
    yield o, doc
    db.close()


class TestHappyPath:
    def test_full_workflow(self, orch):
        o, doc = orch
        ext = o.extract_document(doc["id"])
        assert ext["status"] == "completed"
        assert ext["version"] == 1
        assert ext["total_fields"] >= 1
        assert ext["raw_ocr_markdown"] == "Name: John Smith"
        # document transitioned to completed
        assert o.repos.documents.get(doc["id"])["status"] == "completed"

    def test_fields_saved_with_bboxes(self, orch):
        o, doc = orch
        ext = o.extract_document(doc["id"])
        fields = o.repos.fields.list_for_extraction(ext["id"])
        by_key = {f["field_key"]: f for f in fields}
        assert "Name" in by_key
        f = by_key["Name"]
        assert f["field_type"] == "name"
        # bbox matched back to the fake engine's layout
        assert f["value_bbox"] is not None
        assert len(f["value_bbox"]["polygon"]) == 8
        assert f["original_ocr_text"] == f["field_value"]

    def test_validation_ran(self, orch):
        o, doc = orch
        ext = o.extract_document(doc["id"])
        fields = o.repos.fields.list_for_extraction(ext["id"])
        assert all(f["is_valid"] is not None for f in fields)

    def test_processing_logs_written(self, orch):
        o, doc = orch
        o.extract_document(doc["id"])
        logs = o.repos.logs.list_for_document(doc["id"])
        steps = [(l["step"], l["status"]) for l in logs]
        assert ("ocr", "started") in steps
        assert ("ocr", "completed") in steps
        assert ("llm_extraction", "completed") in steps
        assert ("save", "completed") in steps
        assert ("validation", "completed") in steps

    def test_timings_recorded(self, orch):
        o, doc = orch
        ext = o.extract_document(doc["id"])
        assert ext["ocr_time_ms"] >= 0
        assert ext["llm_time_ms"] >= 0
        assert ext["processing_time_ms"] == ext["ocr_time_ms"] + ext["llm_time_ms"]

    def test_reextraction_bumps_version(self, orch):
        o, doc = orch
        e1 = o.extract_document(doc["id"])
        e2 = o.extract_document(doc["id"])
        assert e2["version"] == 2
        assert o.repos.extractions.get(e1["id"])["is_current"] is False

    def test_layout_and_page_dims_persisted(self, orch):
        o, doc = orch
        ext = o.extract_document(doc["id"])
        assert isinstance(ext["layout_data"], list) and ext["layout_data"]
        assert ext["page_dimensions"]["1"]["width"] == 600


class _FlakyEngine(FakeOCREngine):
    def __init__(self, settings, fail_times=1):
        super().__init__(settings, text="Key: Val")
        self.fail_times = fail_times
        self.calls = 0

    def process_document(self, data, filename):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError("transient OCR failure")
        return super().process_document(data, filename)


class TestFailureAndRetry:
    def test_retry_recovers_transient_failure(self, orch, settings):
        o, doc = orch
        o.engine = _FlakyEngine(settings, fail_times=1)
        o.ocr_retry.initial_interval = 0.01
        ext = o.extract_document(doc["id"])
        assert ext["status"] == "completed"
        assert o.engine.calls == 2

    def test_persistent_failure_marks_document_failed(self, orch, settings):
        o, doc = orch
        o.engine = _FlakyEngine(settings, fail_times=99)
        o.ocr_retry.initial_interval = 0.01
        with pytest.raises(RuntimeError):
            o.extract_document(doc["id"])
        d = o.repos.documents.get(doc["id"])
        assert d["status"] == "failed"
        assert "transient" in d["error_message"]
        ext = o.repos.extractions.get_current_for_document(doc["id"])
        assert ext["status"] == "failed"
        failed_logs = o.repos.logs.failed_steps()
        assert failed_logs

    def test_checkpoint_resume_skips_completed_stages(self, orch, settings):
        o, doc = orch
        # engine succeeds, but extractor blows up on first run
        class Boom(RuleExtractor):
            def __init__(self):
                self.calls = 0

            def extract(self, *a, **k):
                self.calls += 1
                if self.calls == 1:
                    raise RuntimeError("extract boom")
                return super().extract(*a, **k)

        o.extractor = Boom()
        o.extract_retry.max_attempts = 1
        o.ocr_retry.initial_interval = 0.01
        engine_calls_before = 0

        with pytest.raises(RuntimeError):
            o.extract_document(doc["id"])
        state = o.checkpointer.load(doc["id"])
        assert state is not None and "ocr" in state.completed_stages

        # resume: OCR stage must be skipped (engine not called again)
        calls_holder = {"n": 0}
        orig = o.engine.process_document

        def counting(data, filename):
            calls_holder["n"] += 1
            return orig(data, filename)

        o.engine.process_document = counting
        ext = o.extract_document(doc["id"])
        assert ext["status"] == "completed"
        assert calls_holder["n"] == 0  # OCR skipped on resume
        assert o.checkpointer.load(doc["id"]) is None  # cleared after success

    def test_missing_document_raises(self, orch):
        o, _ = orch
        with pytest.raises(ValueError):
            o.extract_document("nope")


def test_extraction_timeout_marks_failed(orch, settings):
    import copy

    o, doc = orch
    o.settings = copy.deepcopy(o.settings)
    o.settings.extraction_timeout_s = 0.0  # immediate budget exhaustion
    with pytest.raises(TimeoutError):
        o.extract_document(doc["id"])
    d = o.repos.documents.get(doc["id"])
    assert d["status"] == "failed"
    assert "budget" in d["error_message"]


def test_new_extraction_request_discards_stale_checkpoint(orch, settings):
    """A failed workflow leaves its checkpoint behind; a later request that
    targets a NEW extraction row must not resume the stale state (which
    would strand the new is_current row at status='processing' forever)."""
    o, doc = orch

    class Boom(RuleExtractor):
        calls = 0

        def extract(self, *a, **k):
            Boom.calls += 1
            if Boom.calls == 1:
                raise RuntimeError("extract boom")
            return super().extract(*a, **k)

    o.extractor = Boom()
    o.extract_retry.max_attempts = 1
    with pytest.raises(RuntimeError):
        o.extract_document(doc["id"])
    stale = o.checkpointer.load(doc["id"])
    assert stale is not None

    # the API flow: POST /api/extractions/{doc} creates a new version first
    new_row = o.repos.extractions.create_new_version(
        doc["id"], status="processing"
    )
    ext = o.extract_document(doc["id"], extraction_id=new_row["id"])
    assert ext["id"] == new_row["id"]  # the NEW row completed
    assert ext["status"] == "completed"
    cur = o.repos.extractions.get_current_for_document(doc["id"])
    assert cur["id"] == new_row["id"]


def test_changed_template_discards_stale_checkpoint(orch, settings):
    """Same guard for a changed template/custom_prompt without an explicit
    extraction_id."""
    o, doc = orch

    class Boom2(RuleExtractor):
        calls = 0

        def extract(self, *a, **k):
            Boom2.calls += 1
            if Boom2.calls == 1:
                raise RuntimeError("boom")
            return super().extract(*a, **k)

    o.extractor = Boom2()
    o.extract_retry.max_attempts = 1
    with pytest.raises(RuntimeError):
        o.extract_document(doc["id"])
    stale = o.checkpointer.load(doc["id"])
    assert stale is not None
    old_eid = stale.extraction_id

    ext = o.extract_document(
        doc["id"], template={"expected_fields": ["Name"]}
    )
    assert ext["status"] == "completed"
    assert ext["id"] != old_eid  # fresh run, not a stale resume
