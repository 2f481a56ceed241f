"""Pure-Python tests for the evidence tooling: the bench tail-capture
contract (round 4's only judging defect) and the SCALING.md section
rewriter (ADVICE r4: repeated probe runs must replace, not accumulate).
No SparkSession needed."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from check_bench_tail import check_line  # noqa: E402
from scale10_probe import replace_section  # noqa: E402


def _bench_line(n_queries=79, first_run_inline=False):
    timings = {f"query_name_number_{i:02d}": 0.5 + i / 100 for i in range(n_queries)}
    d = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "startup_sec": 20.0,
        "first_run_total_sec": 90.0,
        "queries": timings,
    }
    if first_run_inline:  # the round-4 defect shape: cold dict trails
        d = {**{k: v for k, v in d.items() if k != "queries"},
             "queries": timings, "first_run": timings}
    return json.dumps(d)


def test_bench_tail_contract_good_line(capsys):
    assert check_line(_bench_line(), "good")
    out = capsys.readouterr().out
    assert "OK" in out and "steady-state" in out


def test_bench_tail_contract_rejects_trailing_cold_dict(capsys):
    assert not check_line(_bench_line(first_run_inline=True), "bad")
    assert "LAST key" in capsys.readouterr().out


def test_bench_tail_contract_rejects_truncated_line():
    assert not check_line(_bench_line()[:-300], "cut")


def test_replace_section_is_idempotent(tmp_path):
    p = str(tmp_path / "S.md")
    with open(p, "w") as f:
        f.write("# Top\n\nintro\n\n## probe section\n\nold\n\n## Keep\n\nkeep me\n")
    for i in range(3):
        replace_section(p, "## probe section", ["", "## probe section", "", f"v{i}"])
    text = open(p).read()
    assert text.count("## probe section") == 1
    assert "v2" in text and "v0" not in text and "old" not in text
    assert "## Keep" in text and "keep me" in text


def test_replace_section_appends_when_absent(tmp_path):
    p = str(tmp_path / "S.md")
    with open(p, "w") as f:
        f.write("# Doc\n\nbody\n")
    replace_section(p, "## new section", ["", "## new section", "", "tbl"])
    text = open(p).read()
    assert text.startswith("# Doc") and text.rstrip().endswith("tbl")
