"""bench.py stdout contract (r14): the headline line is ALWAYS last and
schema-stable, and when the per-query map outgrows one line it rides
documented sibling lines whose union reconstructs the full map — no line
ever exceeds the driver's per-line capture budget. Pure-function tests,
no Spark session."""

from __future__ import annotations

import importlib.util
import json
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(_HERE, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

_BASE = {
    "metric": "inventory_suite_seconds",
    "value": 58.36,
    "unit": "sec",
    "sf": 0.1,
    "noisy_n": 0,
}


def test_small_map_keeps_single_line_format():
    per_query = {"pricing_summary": 1.2345, "top_orders": 0.1111}
    lines = bench._stdout_lines(dict(_BASE), per_query)
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "inventory_suite_seconds"
    assert parsed["queries"] == {"pricing_summary": 1.23, "top_orders": 0.11}


def test_large_map_splits_into_siblings_plus_pointer_headline():
    # ~98 realistic-length names so the serialized map exceeds the budget
    per_query = {f"some_realistic_query_name_{i:03d}": 0.1 + i / 100
                 for i in range(98)}
    lines = bench._stdout_lines(dict(_BASE), per_query)
    assert len(lines) >= 3  # at least 2 siblings + headline

    # headline LAST, schema unchanged from the pre-r14 pointer form
    head = json.loads(lines[-1])
    assert head["metric"] == "inventory_suite_seconds"
    assert head["value"] == _BASE["value"]
    assert head["n_queries"] == 98
    assert head["queries_file"] == "BENCH_QUERIES.json"
    assert "queries" not in head

    # every line parses standalone and respects the per-line budget
    union: dict[str, float] = {}
    sibs = [json.loads(ln) for ln in lines[:-1]]
    for ln, s in zip(lines[:-1], sibs):
        assert len(ln) <= bench._SIBLING_BUDGET
        assert s["metric"] == "inventory_suite_queries"
        assert s["of"] == len(sibs)
        assert s["sf"] == _BASE["sf"]
        union.update(s["queries"])
    assert [s["part"] for s in sibs] == list(range(1, len(sibs) + 1))

    # union of the siblings == the full 2dp map
    assert union == {k: round(v, 2) for k, v in per_query.items()}

    # the last two siblings + headline fit one ~2 KB tail window: the
    # reason _SIBLING_BUDGET exists (module docstring)
    assert sum(len(ln) + 1 for ln in lines[-3:]) <= 2000
