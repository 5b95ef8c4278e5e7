"""bench_scaling --render-md renders BASELINE.md tables from artifacts
(the r4 verdict's no-hand-transcription rule); these are pure-python."""

import json
import sys

sys.path.insert(0, "/root/repo/tools")

from bench_scaling import load_bench_record, render_md  # noqa: E402


def _write(tmp_path, rec):
    p = tmp_path / "rec.json"
    p.write_text(json.dumps(rec))
    return str(p)


def test_render_scaling_record_with_custom_dirs(tmp_path):
    rec = {
        "metric": "scaling_sf0.1_to_sf1",
        "data_factor": 10,
        "small_dir": ".localdata/sf1",
        "big_dir": ".localdata/sf10",
        "queries": {
            "q_slow": {"small": 1.0, "big": 9.0, "ratio": 9.0},
            "q_flat": {"small": 1.0, "big": 1.1, "ratio": 1.1},
        },
        "small_total": 2.0,
        "big_total": 10.1,
        "total_ratio": 5.05,
    }
    md = render_md(_write(tmp_path, rec))
    assert "| sf1 | 2.0 s" in md
    assert "| sf10 (10x upsampled) | 10.1 s | x5.05 |" in md
    # worst-first ordering
    assert md.index("q_slow") < md.index("q_flat")


def test_render_driver_bench_wrapper(tmp_path):
    inner = {
        "metric": "headline",
        "value": 4.0,
        "queries": {"a": 1.0, "b": 3.0},
        "scaling": {"sf1_queries": {"a": 2.0, "b": 9.0}, "sf1_total": 11.0},
    }
    wrapper = {"tail": "noise\n" + json.dumps(inner)}
    p = _write(tmp_path, wrapper)
    assert load_bench_record(p)["value"] == 4.0
    md = render_md(p)
    assert "| sf0.1 | 4.0 s" in md and "x2.75" in md
    assert md.index("`b`") < md.index("`a`")  # b is x3, a is x2
