"""Regression-guard helpers in bench.py: the comparison must be pure
(ADVICE r3 — the old helper persisted BENCH_BEST.json on every retry
iteration, committing noisy mid-loop samples as new bests)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_check_regressions_is_pure_and_thresholded(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_BEST_PATH", str(tmp_path / "BENCH_BEST.json"))

    best = {"q1": 2.0, "q2": 0.4, "q3": 2.0}
    timings = {
        "q1": 3.5,   # >1.5x, >1s, gap >0.75 → regression
        "q2": 0.9,   # sub-second: exempt
        "q3": 2.6,   # 1.3x: under the ratio threshold
        "q4": 9.9,   # no recorded best: never a regression
    }
    flagged = bench._check_regressions(best, timings)
    assert set(flagged) == {"q1"}
    # pure: nothing persisted by the check
    assert not os.path.exists(str(tmp_path / "BENCH_BEST.json"))
    # and the snapshot passed in is not mutated
    assert best == {"q1": 2.0, "q2": 0.4, "q3": 2.0}


def test_persist_best_single_write_keeps_minima(tmp_path, monkeypatch):
    bench = _load_bench()
    best_path = tmp_path / "BENCH_BEST.json"
    best_path.write_text(json.dumps({"0.1": {"q1": 2.0, "q2": 0.4}}))
    monkeypatch.setattr(bench, "_BEST_PATH", str(best_path))

    best = bench._load_best("0.1")
    assert best == {"q1": 2.0, "q2": 0.4}
    bench._persist_best("0.1", best, {"q1": 1.5, "q2": 0.9, "q5": 3.0})
    on_disk = json.loads(best_path.read_text())["0.1"]
    assert on_disk == {"q1": 1.5, "q2": 0.4, "q5": 3.0}  # improved, kept, new

    # nothing improved → no write (mtime unchanged)
    before = best_path.stat().st_mtime_ns
    bench._persist_best("0.1", bench._load_best("0.1"), {"q1": 9.0})
    assert best_path.stat().st_mtime_ns == before


def test_bench_json_line_fits_driver_tail_window():
    """The driver keeps only the last ~2000 chars of stdout and parses
    the JSON line from that tail. Round 6's line overflowed it
    (BENCH_r06.json: "parsed": null) — pin the worst-case line length
    (every headline query at 999.999s, a regressions block present)
    under the window with slack for progress-bar residue."""
    bench = _load_bench()
    worst = {name: 999.999 for name in bench.HEADLINE}
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(worst.values()), 3),
        "unit": "sec",
        "queries": worst,
        "sf": 0.1,
        "regressions": {"x127_kcore_peel": "999.99s vs best 4.21s"},
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) < 1800, (
        f"bench JSON line would be {len(line)} chars; the driver tail "
        "window is ~2000 — trim the headline set or the encoding"
    )
