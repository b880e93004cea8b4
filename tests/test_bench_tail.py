"""The driver keeps only the last 2,000 bytes of stdout (every shipped
BENCH_r*.json has a "tail" of exactly 2,000 chars; round 3's summary line
outgrew it and shipped parsed:null). bench.tail_safe must make the final
line fit that window whole, never dropping the north_rule gate."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _summary(n_queries: int) -> dict:
    return {
        "metric": "bench_total_wall",
        "value": 804.65,
        "unit": "sec",
        "queries": {f"query_name_number_{i:03d}": round(i * 0.37, 2)
                    for i in range(n_queries)},
        "sf": 0.1,
        "crawl_scaling": {
            "harness": "spark-submit --py-files",
            "local1": {"cpus": 1, "urls": 120000, "wall_s": 162.51,
                       "urls_per_sec": 738.4, "clean_window": True, "n_runs": 1},
            "local4": {"cpus": 4, "urls": 120000, "wall_s": 43.99,
                       "urls_per_sec": 2727.7, "clean_window": True, "n_runs": 2},
            "local16": {"cpus": 16, "urls": 120000, "wall_s": 18.84,
                        "urls_per_sec": 6368.1, "clean_window": True, "n_runs": 2},
            "scaling_efficiency_n_to_4n": 0.924,
            "scaling_efficiency_4_to_16": 0.584,
            "canary": {"best_urls_per_sec_4proc": 3573.4,
                       "clean_window_threshold": 0.85, "levels_clean": True},
            "gate": {"rule": "scaling_efficiency_n_to_4n >= 0.8 (north_rule)",
                     "value": 0.924, "verdict": "PASS",
                     "gate_levels_clean": True,
                     "plausibility_cap_from_ceiling": 1.084,
                     "within_plausibility_cap": True},
            "single_box_mp_ceiling": {"ceiling_1_to_4": 1.054,
                                      "ceiling_4_to_16": 0.825,
                                      "urls_per_sec_4proc": 3984.1},
            "loop": {"urls": 120000, "wall_s": 153.29,
                     "epoch_walls_s": [32.63, 48.29, 29.16],
                     "discovery_walls_s": [22.91, 11.58, 8.72],
                     "discoveries_per_epoch": 5000},
        },
        "detail_file": "BENCH_DETAIL.json",
    }


def test_small_summary_untouched():
    m = _bench()
    s = _summary(5)
    assert m.tail_safe(s) == s


def test_fits_driver_window_at_every_query_count():
    m = _bench()
    for n in (25, 70, 132, 500):
        line = json.dumps(m.tail_safe(_summary(n)))
        assert len(line) <= m.DRIVER_TAIL_BYTES, (n, len(line))
        got = json.loads(line)  # the driver can parse the whole line
        # the north_rule gate is never dropped
        assert got["crawl_scaling"]["gate"]["verdict"] == "PASS"
        assert got["crawl_scaling"]["gate"]["gate_levels_clean"] is True
        if n > 30:
            assert got["queries_truncated_see_detail_file"] is True
            assert got["detail_file"] == "BENCH_DETAIL.json"


def test_input_not_mutated():
    m = _bench()
    s = _summary(200)
    before = json.dumps(s)
    m.tail_safe(s)
    assert json.dumps(s) == before
