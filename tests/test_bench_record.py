"""bench.py record/emit semantics (round-2 advisor: best-so-far must never
be clobbered by a later brown-out-degraded measurement; JSON must stay
unambiguous)."""

import importlib
import json
import sys

import pytest


@pytest.fixture(autouse=True)
def _no_bank_side_effects(monkeypatch):
    """Keep unit tests from touching the real .bench_bank.json; bank tests
    opt back in by pointing _BANK_PATH at tmp_path."""
    monkeypatch.setenv("BENCH_BANK", "0")


def fresh_bench():
    sys.modules.pop("bench", None)
    import bench

    return importlib.reload(bench)


class TestRecord:
    def test_keeps_best_within_tier(self):
        b = fresh_bench()
        b._record(5.0, "8x960px", True)
        b._record(2.0, "8x960px", True)  # later, worse (brown-out)
        assert b._best["value"] == 5.0
        assert b._best["vs_baseline"] == round(5.0 / 0.4, 2)

    def test_full_size_owns_headline(self):
        b = fresh_bench()
        b._record(30.0, "1x384px", False)  # small probe, fast
        assert b._best["value"] == 30.0
        b._record(10.0, "8x960px", True)   # full-size lands slower
        assert b._best["value"] == 10.0    # but owns the headline
        assert b._best["value_at"] == "8x960px"

    def test_small_probe_stands_in_when_no_full_size(self):
        b = fresh_bench()
        b._record(7.5, "1x384px", False)
        assert b._best["value"] == 7.5
        assert b._best["value_at"] == "1x384px"

    def test_all_measurements_logged(self):
        b = fresh_bench()
        b._record(1.0, "a", False)
        b._record(2.0, "b", True)
        assert len(b._best["measurements"]) == 2

    def test_bounded_records_on_late_completion(self):
        """Simulated brown-out: the waiter times out and moves on, but the
        step completes later (link recovered) and must still bank its
        figure — the r03 failure mode (small-warm 'timed out' at t=400 with
        nothing recorded)."""
        import time

        b = fresh_bench()
        step = b.Bounded("slow", lambda: time.sleep(0.3) or 1,
                         record=(4, "8x960px", True))
        assert step.wait(0.05) == "timeout"          # waiter gives up
        assert b._best["value"] == 0.0               # nothing banked yet
        assert step.done.wait(2.0)                   # ...link 'recovers'
        time.sleep(0.05)                             # record runs post-set
        assert b._best["value"] > 0.0                # late finish banked
        assert b._best["value_at"] == "8x960px"

    def test_bounded_no_record_on_error(self):
        def boom():
            raise RuntimeError("poison page")

        b = fresh_bench()
        step = b.Bounded("err", boom, record=(4, "8x960px", True))
        assert step.wait(2.0) == "error"
        assert b._best["value"] == 0.0
        assert not b._best["measurements"]

    def test_make_page_renders_words(self):
        b = fresh_bench()
        img = b.make_page(384, seed=3)
        assert img.shape == (384, 384, 3)
        assert (img < 100).sum() > 500  # carries ink

    def test_bank_fallback_on_dead_window(self, tmp_path, monkeypatch):
        """Simulated brown-out covering the WHOLE bench window (the r01-r04
        driver failure mode): every probe fails, nothing measured — the
        emitted payload must fall back to the bank's last real measurement,
        labeled banked=true with an honest link_state."""
        monkeypatch.setenv("BENCH_BANK", "1")
        b = fresh_bench()
        b._BANK_PATH = str(tmp_path / "bank.json")
        (tmp_path / "bank.json").write_text(json.dumps(
            {"value": 6.2, "vs_baseline": 15.5, "value_at": "64x960px",
             "ts": 0.0, "git": "abc123"}
        ))
        # fake the probe loop all failing (link dead)
        for _ in range(5):
            with b._lock:
                b._best["probes"]["attempted"] += 1
        with b._lock:
            b._best["link_state"] = "flaky"
        out = b._final_payload()
        assert out["value"] == 6.2
        assert out["banked"] is True
        assert out["banked_git"] == "abc123"
        assert out["value_at"] == "64x960px"
        assert out["link_state"] == "flaky"  # honesty preserved
        assert out["probes"]["ok"] == 0

    def test_fresh_measurement_beats_bank(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BENCH_BANK", "1")
        b = fresh_bench()
        b._BANK_PATH = str(tmp_path / "bank.json")
        (tmp_path / "bank.json").write_text(json.dumps(
            {"value": 99.0, "ts": 0.0}
        ))
        b._record(3.0, "8x960px", True)
        out = b._final_payload()
        assert out["value"] == 3.0          # fresh number owns the line
        assert "banked" not in out

    def test_bank_keeps_best_across_runs(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BENCH_BANK", "1")
        b = fresh_bench()
        b._BANK_PATH = str(tmp_path / "bank.json")
        b._record(8.0, "8x960px", True)
        saved = json.loads((tmp_path / "bank.json").read_text())
        assert saved["value"] == 8.0
        # a later degraded run must not clobber the banked best
        b2 = fresh_bench()
        b2._BANK_PATH = str(tmp_path / "bank.json")
        b2._record(1.0, "8x960px", True)
        saved = json.loads((tmp_path / "bank.json").read_text())
        assert saved["value"] == 8.0

    def test_emitted_json_fields(self):
        b = fresh_bench()
        b._record(3.0, "8x960px", True)
        b._phase("wave8", "ok", 1.2)
        s = json.dumps(b._best)
        parsed = json.loads(s)
        for key in ("metric", "value", "unit", "vs_baseline", "link_state",
                    "probes", "phases", "measurements", "error"):
            assert key in parsed
        assert parsed["metric"] == "pages_per_sec_per_chip"
