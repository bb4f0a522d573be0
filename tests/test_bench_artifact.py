"""bench.py artifact plumbing — no SparkSession needed.

The r5 round artifact (BENCH_r05.json) ended with "parsed": null: the
stdout JSON line outgrew the driver's 2000-char tail capture and was
truncated mid-object. These tests pin the two fixes:

1. `_load_prev_bench` skips truncated/queryless artifacts gracefully
   (no AttributeError on "parsed": null) and prefers BENCH_SELF.json,
   the full document bench.py now writes itself.
2. `_compact_stdout_line` stays far inside the capture window while
   keeping the driver-contract fields (metric/value/unit/queries/sf).
"""

import json

import bench


def _write(path, doc):
    path.write_text(json.dumps(doc))


def _full_doc(value=0.55):
    return {
        "metric": "headline_queryset_median_total",
        "value": value,
        "unit": "sec",
        "queries": {
            "q1_pricing_summary": 0.0837,
            "q3_shipping_priority": 0.0677,
            "q5_local_supplier": 0.0426,
            "w1_topk_per_customer": 0.1018,
            "e1_daily_active": 0.0352,
            "d1_dedup_docs": 0.0413,
            "v1_cosine_topk": 0.1787,
        },
        "build_and_exec_queries": {"q1_pricing_summary": 0.2},
        "build_and_exec_total": 1.4,
        "first_run_queries": {"q1_pricing_summary": 0.9},
        "first_run_total": 10.6,
        "job_floor_sec": 0.0677,
        "job_floor_spread": [0.0568, 0.0992],
        "query_spread": {"q1_pricing_summary": [0.05, 0.12]},
        "vs_prev": {
            "prev_round_file": "BENCH_r04.json",
            "prev_total": 0.5997,
            "total_delta_pct": -8.1,
            "per_query": {
                q: {
                    "prev": 0.1,
                    "cur": 0.09,
                    "delta_pct": -10.0,
                    "work_prev": 0.03,
                    "work_cur": 0.02,
                    "noise_band": 0.03,
                    "verdict": "noise",
                }
                for q in [
                    "q1_pricing_summary",
                    "q3_shipping_priority",
                    "q5_local_supplier",
                    "w1_topk_per_customer",
                    "e1_daily_active",
                    "d1_dedup_docs",
                    "v1_cosine_topk",
                ]
            },
            "regression_verdict": "no regression",
        },
        "errors": {},
        "waivers": {"d1_dedup_docs": "overhead-bound: " + "x" * 300},
        "sf": 0.1,
    }


def test_load_prev_skips_truncated_parsed_null(tmp_path, monkeypatch):
    # exact r5 failure shape: wrapper with parsed:null must be skipped,
    # falling back to the older parseable round — not AttributeError
    _write(
        tmp_path / "BENCH_r05.json",
        {"n": 6, "rc": 0, "tail": "…truncated…", "parsed": None},
    )
    _write(tmp_path / "BENCH_r04.json", {"parsed": _full_doc(0.5997)})
    monkeypatch.setattr(bench, "REPO_ROOT", str(tmp_path))
    name, doc = bench._load_prev_bench()
    assert name == "BENCH_r04.json"
    assert doc["value"] == 0.5997


def test_load_prev_prefers_self_doc(tmp_path, monkeypatch):
    _write(tmp_path / "BENCH_r04.json", {"parsed": _full_doc(0.5997)})
    _write(tmp_path / "BENCH_SELF.json", _full_doc(0.551))
    monkeypatch.setattr(bench, "REPO_ROOT", str(tmp_path))
    name, doc = bench._load_prev_bench()
    assert name == "BENCH_SELF.json"
    assert doc["value"] == 0.551


def test_load_prev_none_when_nothing_parseable(tmp_path, monkeypatch):
    _write(tmp_path / "BENCH_r03.json", {"parsed": None})
    (tmp_path / "BENCH_r02.json").write_text("{not json")
    monkeypatch.setattr(bench, "REPO_ROOT", str(tmp_path))
    assert bench._load_prev_bench() is None


def test_compact_line_fits_driver_capture_with_margin():
    line = bench._compact_stdout_line(_full_doc())
    # driver keeps a 2000-char stdout tail; stay under half of it so
    # headliner additions / longer error strings keep fitting
    assert len(line) < 1000, len(line)
    doc = json.loads(line)
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in doc
    assert len(doc["queries"]) == 7
    assert doc["regression_verdict"] == "no regression"
    # the bulky blocks must NOT be on stdout — they live in BENCH_SELF.json
    assert "per_query" not in line
    assert "waivers" not in doc
    assert doc["full_doc"] == "BENCH_SELF.json"
