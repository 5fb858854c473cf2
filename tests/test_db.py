"""Persistence layer tests (parity: backend/database/crud.py behaviors)."""

import pytest

from ocr_system_tpu.db.connection import Database
from ocr_system_tpu.db.crud import Repositories, seed_templates


@pytest.fixture()
def repos(tmp_path):
    db = Database(tmp_path / "t.db")
    yield Repositories(db)
    db.close()


def _doc(repos, name="a.png", **kw):
    return repos.documents.create(
        filename=f"doc_x_{name}",
        original_filename=name,
        file_path=f"/tmp/{name}",
        file_size=100,
        file_type="png",
        **kw,
    )


class TestDocuments:
    def test_create_and_get(self, repos):
        d = _doc(repos)
        assert d["status"] == "pending"
        assert repos.documents.get(d["id"])["original_filename"] == "a.png"

    def test_soft_delete_hides(self, repos):
        d = _doc(repos)
        assert repos.documents.soft_delete(d["id"])
        assert repos.documents.get_active(d["id"]) is None
        assert repos.documents.get(d["id"]) is not None  # row still exists

    def test_list_pagination_and_search(self, repos):
        for i in range(5):
            _doc(repos, f"invoice_{i}.png")
        _doc(repos, "receipt.pdf")
        rows, total = repos.documents.list(page=1, page_size=3)
        assert total == 6 and len(rows) == 3
        rows, total = repos.documents.list(search="invoice")
        assert total == 5
        rows, total = repos.documents.list(status="completed")
        assert total == 0

    def test_update_status_sets_processed_at(self, repos):
        d = _doc(repos)
        out = repos.documents.update_status(d["id"], "completed")
        assert out["status"] == "completed" and out["processed_at"]

    def test_status_counts(self, repos):
        _doc(repos)
        d = _doc(repos, "b.png")
        repos.documents.update_status(d["id"], "failed", "boom")
        counts = repos.documents.status_counts()
        assert counts == {"pending": 1, "failed": 1}


class TestExtractionVersioning:
    def test_create_new_version_bumps_and_demotes(self, repos):
        d = _doc(repos)
        e1 = repos.extractions.create_new_version(d["id"], status="completed")
        e2 = repos.extractions.create_new_version(d["id"], status="processing")
        assert (e1["version"], e2["version"]) == (1, 2)
        assert repos.extractions.get(e1["id"])["is_current"] is False
        assert e2["is_current"] is True
        cur = repos.extractions.get_current_for_document(d["id"])
        assert cur["id"] == e2["id"]

    def test_unique_document_version(self, repos):
        d = _doc(repos)
        repos.extractions.create_new_version(d["id"])
        with pytest.raises(Exception):
            repos.extractions.create(document_id=d["id"], version=1)

    def test_finalize(self, repos):
        d = _doc(repos)
        e = repos.extractions.create_new_version(d["id"])
        out = repos.extractions.finalize(e["id"])
        assert out["is_finalized"] is True and out["finalized_at"]

    def test_update_stats(self, repos, settings):
        d = _doc(repos)
        e = repos.extractions.create_new_version(d["id"])
        repos.fields.bulk_create(
            e["id"],
            [
                {"field_key": "A", "field_value": "1", "confidence": 0.95},
                {"field_key": "B", "field_value": "2", "confidence": 0.7},
                {"field_key": "C", "field_value": "3", "confidence": 0.3},
            ],
        )
        out = repos.extractions.update_stats(e["id"], settings)
        assert out["total_fields"] == 3
        assert out["high_confidence_fields"] == 1
        assert out["low_confidence_fields"] == 1
        assert abs(out["avg_confidence"] - 0.65) < 1e-6

    def test_layout_json_roundtrip(self, repos):
        d = _doc(repos)
        layout = [{"type": "word", "content": "hi", "polygon": [1, 2, 3, 4, 5, 6, 7, 8]}]
        e = repos.extractions.create_new_version(
            d["id"], layout_data=layout, page_dimensions={"1": {"width": 100}}
        )
        got = repos.extractions.get(e["id"])
        assert got["layout_data"] == layout
        assert got["page_dimensions"]["1"]["width"] == 100


class TestFields:
    def test_bulk_create_sort_order(self, repos):
        d = _doc(repos)
        e = repos.extractions.create_new_version(d["id"])
        repos.fields.bulk_create(
            e["id"],
            [{"field_key": k, "field_value": k, "confidence": 0.9} for k in "abc"],
        )
        rows = repos.fields.list_for_extraction(e["id"])
        assert [r["sort_order"] for r in rows] == [0, 1, 2]

    def test_update_value_preserves_original_and_audits(self, repos):
        d = _doc(repos)
        e = repos.extractions.create_new_version(d["id"])
        (f,) = repos.fields.bulk_create(
            e["id"], [{"field_key": "k", "field_value": "v0", "confidence": 0.9}]
        )
        repos.fields.update_value(f["id"], "v1")
        repos.fields.update_value(f["id"], "v2")
        got = repos.fields.get(f["id"])
        assert got["field_value"] == "v2"
        assert got["original_value"] == "v0"  # first edit preserved original
        assert got["is_edited"] is True
        edits = repos.edits.list_for_field(f["id"])
        assert [(x["old_value"], x["new_value"]) for x in edits] == [
            ("v0", "v1"), ("v1", "v2"),
        ]

    def test_confidence_check_constraint(self, repos):
        d = _doc(repos)
        e = repos.extractions.create_new_version(d["id"])
        with pytest.raises(Exception):
            repos.fields.create(
                extraction_id=e["id"], field_key="x", confidence=1.5
            )

    def test_low_confidence_query(self, repos):
        d = _doc(repos)
        e = repos.extractions.create_new_version(d["id"])
        repos.fields.bulk_create(
            e["id"],
            [
                {"field_key": "hi", "field_value": "", "confidence": 0.9},
                {"field_key": "lo", "field_value": "", "confidence": 0.2},
            ],
        )
        rows = repos.fields.low_confidence(e["id"], 0.6)
        assert [r["field_key"] for r in rows] == ["lo"]


class TestTemplatesAndLogs:
    def test_seed_templates_idempotent(self, repos):
        assert seed_templates(repos) == 3
        assert seed_templates(repos) == 0
        inv = repos.templates.get_by_name("Invoice")
        assert any(f["name"] == "Total Amount" for f in inv["expected_fields"])

    def test_increment_usage(self, repos):
        seed_templates(repos)
        t = repos.templates.get_by_name("Invoice")
        repos.templates.increment_usage(t["id"])
        assert repos.templates.get(t["id"])["usage_count"] == 1

    def test_log_step_and_stats(self, repos):
        d = _doc(repos)
        repos.logs.log_step(d["id"], "ocr", "completed", duration_ms=120)
        repos.logs.log_step(d["id"], "ocr", "failed", message="x", duration_ms=80)
        logs = repos.logs.list_for_document(d["id"])
        assert len(logs) == 2
        assert len(repos.logs.failed_steps()) == 1
        stats = repos.logs.step_stats()
        ocr_ok = next(r for r in stats if r["step"] == "ocr" and r["status"] == "completed")
        assert ocr_ok["c"] == 1 and ocr_ok["av"] == 120


class TestConcurrentWrites:
    """SQLite serving story (deliberate Postgres substitution, PARITY.md):
    WAL + busy_timeout=30s + thread-local connections must survive
    concurrent writers — the pattern multi-threaded serving actually
    produces (uploads inserting documents while the orchestrator writes
    extractions and logs). Documents the single-writer-at-a-time
    constraint: writes serialize, none may fail."""

    def test_concurrent_uploads_one_database(self, tmp_path):
        import threading

        from ocr_system_tpu.db.connection import Database
        from ocr_system_tpu.db.crud import Repositories

        db = Database(tmp_path / "conc.db")
        repos = Repositories(db)
        N_THREADS, PER = 8, 12
        errors: list[Exception] = []

        def worker(t):
            try:
                for i in range(PER):
                    d = _doc(repos, name=f"t{t}_{i}.png")
                    e = repos.extractions.create_new_version(
                        d["id"], status="processing"
                    )
                    repos.logs.log_step(d["id"], "ocr", "completed",
                                        duration_ms=5)
                    repos.extractions.update(e["id"], status="completed")
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(N_THREADS)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors[:3]
        assert repos.documents.list()[1] == N_THREADS * PER
        db.close()

    def test_concurrent_writers_separate_connections(self, tmp_path):
        """Multi-worker shape: several Database objects (own connection
        pools) on the SAME file, writing simultaneously — busy_timeout
        must absorb the lock contention."""
        import threading

        from ocr_system_tpu.db.connection import Database
        from ocr_system_tpu.db.crud import Repositories

        path = tmp_path / "multi.db"
        Database(path).close()  # create schema once
        N_PROCLIKE, PER = 4, 10
        errors: list[Exception] = []

        def worker(w):
            try:
                repos = Repositories(Database(path))
                for i in range(PER):
                    _doc(repos, name=f"w{w}_{i}.png")
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(w,))
                   for w in range(N_PROCLIKE)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors[:3]
        repos = Repositories(Database(path))
        assert repos.documents.list()[1] == N_PROCLIKE * PER
