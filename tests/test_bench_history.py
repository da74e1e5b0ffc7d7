"""bench.py provenance plumbing: bench_history.jsonl append + last_good
emission (VERDICT r4 #1: a relay-down capture must document the most
recent real on-chip measurement instead of a bare 0.0)."""

import importlib.util
import json
import os
import sys


def _load_bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "HISTORY_PATH", str(tmp_path / "hist.jsonl"))
    return mod


class TestBenchHistory:
    def test_append_and_read_last_good(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        assert bench._read_last_good() is None
        bench._append_history({"metric": "m", "value": 100.0})
        bench._append_history({"metric": "m", "value": 162.2,
                               "single_dispatch_fps": 138.3})
        last = bench._read_last_good()
        assert last["value"] == 162.2
        assert last["single_dispatch_fps"] == 138.3
        assert "timestamp" in last

    def test_corrupt_history_is_nonfatal(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        (tmp_path / "hist.jsonl").write_text("{not json\n")
        assert bench._read_last_good() is None

    def test_failure_result_carries_last_good(self, tmp_path, monkeypatch):
        """main() path: run() fails (value 0) -> no append, but the
        emitted JSON includes the prior good entry."""
        bench = _load_bench(tmp_path, monkeypatch)
        bench._append_history({"metric": "m", "value": 162.2})
        monkeypatch.setattr(
            bench, "run",
            lambda: {"metric": "m", "value": 0.0, "unit": "frames/s",
                     "vs_baseline": 0.0, "error": "probe timeout"},
        )
        import io
        import contextlib

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        out = json.loads(buf.getvalue())
        assert out["value"] == 0.0
        assert out["last_good"]["value"] == 162.2
        # the failed run must NOT pollute the history
        lines = (tmp_path / "hist.jsonl").read_text().strip().split("\n")
        assert len(lines) == 1
