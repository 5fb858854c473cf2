"""bench.py record/emit semantics (round-2 advisor: best-so-far must never
be clobbered by a later brown-out-degraded measurement; JSON must stay
unambiguous)."""

import importlib
import json
import sys


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
