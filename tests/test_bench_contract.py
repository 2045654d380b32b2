"""Bench stdout-contract pins (r20, VERDICT r19 item 3).

The driver captures only a bounded tail of bench.py's stdout and parses
the final JSON line from it. That line outgrew the capture three rounds
running (r16-r18: `parsed: None` in the PERF artifacts — three rounds of
lost round-over-round comparisons); the r19 line parsed at 2565 bytes.
`bench.stdout_line` now emits the minimal contract payload; this test
pins its ceiling so future HEADLINE additions cannot silently push the
line back over the observed parse limit.
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def _line_for(values: dict) -> str:
    import bench

    result = {
        "metric": "headline_queries_warm_total",
        "value": round(sum(values.values()), 3),
        "unit": "sec",
        "queries": values,
        "sf": 0.1,
        "reps": 5,
        # fields that must NOT reach stdout (BENCH_DETAIL carries them)
        "loadavg_1m": 1.23,
        "calibration_sec": 1.234,
        "corpus_version": "v16",
        "fhir_corpus_bytes": 11277050,
    }
    return bench.stdout_line(result)


def test_bench_stdout_line_bounded():
    """Worst-case-width values for every current HEADLINE row must fit
    comfortably inside the driver's tail capture (observed parse limit
    >= 2565 bytes in r19; the 81 pinned names alone floor the line at
    ~2.1 KB, so the budget asserts the achievable minimum plus slack,
    not a number the contract cannot reach)."""
    import bench

    # 99.99 is the widest 2-decimal value a sane headline row produces
    line = _line_for({n: 99.99 for n in bench.HEADLINE})
    assert len(line) < 2400, (len(line), "stdout line outgrew the budget")
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["unit"] == "sec" and parsed["metric"]


def test_bench_stdout_line_minimal_fields():
    """Only the contract fields reach stdout; per-query values are
    2-decimal (full precision lives in BENCH_DETAIL.json)."""
    line = _line_for({"pricing_summary": 0.405})
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf", "reps"}
    assert parsed["queries"]["pricing_summary"] == 0.41
    # compact separators: no spaces outside strings
    assert ": " not in line and ", " not in line
