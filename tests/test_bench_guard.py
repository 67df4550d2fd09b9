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


def test_phase_factor_normalizes_machine_wide_slowdowns():
    """BENCH_NOTES.md documents 1.3-3x multi-minute machine phases that
    inflate EVERY query; bests are minima over history so they skew to
    fast phases. The guard must flag the query that regressed RELATIVE
    to the run's own median ratio, not every query in a slow phase."""
    bench = _load_bench()
    best = {f"q{i}": 2.0 for i in range(12)}
    # machine-wide 1.4x slow phase, one genuine 2.5x plan regression
    slow = {f"q{i}": 2.8 for i in range(12)}
    slow["q3"] = 5.0
    phase = bench._phase_factor(best, slow)
    assert abs(phase - 1.4) < 0.01
    flagged = bench._check_regressions(best, slow, phase)
    assert set(flagged) == {"q3"}
    # neutral phase: a lone 1.7x/1s+ regression still flags
    neutral = {f"q{i}": 2.1 for i in range(12)}
    neutral["q5"] = 3.4
    phase_n = bench._phase_factor(best, neutral)
    assert bench._phase_factor(best, neutral) < 1.1
    assert set(bench._check_regressions(best, neutral, phase_n)) == {"q5"}
    # fewer than 8 comparable queries: no phase estimate, factor 1.0
    assert bench._phase_factor({"a": 1.0}, {"a": 3.0}) == 1.0
    # a fast phase never tightens the guard below the plain 1.5x rule
    fast = {f"q{i}": 1.9 for i in range(12)}
    assert bench._phase_factor(best, fast) == 1.0


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


def test_best_snapshots_keyed_by_core_count(tmp_path, monkeypatch):
    """An 8-core run must not be guarded against 32-core bests (it is
    intentionally slower on parallel queries — the sf1 sweep's 8-core
    leg flagged the BEST-scaling queries and exited nonzero). Legacy
    plain-sf sections stay valid for the historical 32-core runs."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_BEST_PATH", str(tmp_path / "b.json"))
    bench._persist_best("0.1", {}, {"q": 2.0}, cpus=32)
    bench._persist_best("0.1", {}, {"q": 9.0}, cpus=8)
    data = json.loads((tmp_path / "b.json").read_text())
    assert data["0.1"] == {"q": 2.0}  # legacy key for 32 cores
    assert data["0.1@c8"] == {"q": 9.0}
    assert bench._load_best("0.1", 8) == {"q": 9.0}
    assert bench._load_best("0.1", 32) == {"q": 2.0}
    # and a fresh core count has no bests -> guard silent, not spurious
    assert bench._load_best("0.1", 16) == {}


def test_bench_json_line_fits_driver_tail_window():
    """The driver keeps the last ~2000 chars of MERGED stdout+stderr
    and parses the JSON from that tail. Rounds 6 AND 7 both recorded
    "parsed": null (r6: fat line; r7: the samples line on stderr landed
    after the JSON in the merge) — pin the worst-case emitted length
    (every headline query at 999.999s, a mass-regression run) under the
    budget, and that the result stays parseable with the slowest
    queries intact."""
    bench = _load_bench()
    worst = {name: 999.999 for name in bench.HEADLINE}
    regressions = {name: "999.99s vs best 4.21s" for name in bench.HEADLINE}
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(worst.values()), 3),
        "unit": "sec",
        "queries": worst,
        "sf": 0.1,
        "regressions": regressions,
    }
    line = bench._emit_line(out)
    assert len(line) <= bench._LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == out["value"]
    assert len(parsed["regressions"]) <= 3
    assert parsed["regressions_total"] == len(bench.HEADLINE)


def test_emit_line_carries_all_headline_names():
    """r12 PERF recorded two phantom 'dropped_from_bench' queries
    because the old emitter shed the fastest 15 entries once the line
    outgrew its budget. The precision ladder (2-dec → 1-dec → ints for
    whole/>=10s values) must carry ALL headline names with zero drops,
    at today's timings AND at a 10x-slower mass-regression run, inside
    the driver's hard 2000-char tail window."""
    bench = _load_bench()
    assert bench._LINE_BUDGET <= 1999  # line + newline inside the window
    detail_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    real = json.load(open(detail_path))["timings"] if os.path.exists(detail_path) else {}
    for case in (
        {n: real.get(n, 1.5) for n in bench.HEADLINE},  # today's shape
        {n: 9.99 for n in bench.HEADLINE},              # everything 5-10x slower
        {n: 99.9 for n in bench.HEADLINE},              # pathological
    ):
        out = {
            "metric": "headline_queries_total",
            "value": round(sum(case.values()), 3),
            "unit": "sec",
            "queries": case,
            "sf": 0.1,
        }
        line = bench._emit_line(out)
        assert len(line) <= bench._LINE_BUDGET
        parsed = json.loads(line)
        assert set(parsed["queries"]) == set(bench.HEADLINE)
        assert "queries_dropped" not in parsed
        # contract keys intact, values still plain seconds
        assert parsed["unit"] == "sec" and parsed["metric"] and parsed["sf"]
        for name, v in parsed["queries"].items():
            assert abs(v - case[name]) <= 0.5 + 0.05 * case[name]


def test_emit_line_drops_fastest_queries_first():
    """Over-budget lines shed the FASTEST queries (slow ones are the
    perf signal) and record how many were dropped."""
    bench = _load_bench()
    queries = {f"query_with_a_rather_long_name_{i:04d}": float(i) for i in range(200)}
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    line = bench._emit_line(out)
    assert len(line) <= bench._LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert parsed["queries_dropped"] == 200 - len(kept)
    # the slowest query always survives truncation
    assert "query_with_a_rather_long_name_0199" in kept
    assert min(kept.values()) > max(
        v for k, v in queries.items() if k not in kept
    )


def test_bench_writes_nothing_to_stderr():
    """Source-level pin: the driver merges stderr into the parsed tail,
    so bench.py must never print there, and the final stdout print must
    come after spark.stop() (no JVM shutdown chatter after the JSON)."""
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    with open(path) as fh:
        src = fh.read()
    assert "sys.stderr" not in src
    assert src.index("spark.stop()") < src.index("print(_emit_line(out))")


def test_write_detail_roundtrips(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_DETAIL_PATH", str(tmp_path / "BENCH_DETAIL.json"))
    bench._write_detail(
        "0.1", {"q1": 1.234}, {"q1": 3}, {"q1": "1.23s vs best 0.5s"}
    )
    detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert detail["timings"] == {"q1": 1.234}
    assert detail["samples"] == {"q1": 3}
    assert detail["total_sec"] == 1.234
