"""Unit tests for scripts/profile_trace.py's perfetto reduction.

The capture side rides bench.py's BENCH_TRACE hook (needs a real chip);
the parser is pure and tested here on a synthetic trace shaped like the
jax.profiler perfetto export (device process + 'XLA Ops' thread metadata,
X events carrying tf_op / source / hlo_category / model_flops args).
"""

import gzip
import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
import profile_trace  # noqa: E402


def _ev(name, dur_us, tf_op="", cat="loop fusion", flops=0, byts=0,
        pid=3, tid=3):
    return {
        "ph": "X", "pid": pid, "tid": tid, "ts": 0.0, "dur": dur_us,
        "name": name,
        "args": {
            "tf_op": tf_op, "hlo_category": cat,
            "model_flops": str(flops), "bytes_accessed": str(byts),
            "source": "x.py:1",
        },
    }


def _trace():
    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name",
         "args": {"name": "python"}},
    ]
    events = meta + [
        # container: must NOT be summed
        _ev("while.1", 1e6, "jit(f)/while", cat="while"),
        # two resblock fusions inside the while
        _ev("fusion.10", 2000.0,
            "jit(f)/renderer_composite/while/body/resnetfc_infer/resblock/dot",
            flops=4e9, byts=1e9),
        _ev("fusion.11", 2000.0,
            "jit(f)/renderer_composite/while/body/resnetfc_infer/resblock/dot",
            flops=4e9, byts=1e9),
        # gather under encoder_index
        _ev("fusion.20", 1000.0,
            "jit(f)/renderer_composite/while/body/encoder_index/gather",
            cat="custom fusion", byts=2e9),
        # host-side python event: must be ignored entirely
        _ev("py", 5e6, "", pid=701, tid=9),
        # unscoped device op
        _ev("copy.1", 100.0, "jit(f)/transpose", cat="copy"),
    ]
    return events


def test_device_op_selection_and_stages():
    events = _trace()
    ops = profile_trace.device_op_events(events)
    names = {e["name"] for e in ops}
    assert "py" not in names and "fusion.10" in names

    stages, per_op = profile_trace.aggregate(ops, iters=2)
    # container while excluded
    total = sum(v[0] for v in stages.values())
    assert total == pytest.approx((2000 + 2000 + 1000 + 100) / 1000 / 2)
    # innermost scope wins: resblock, not resnetfc_infer/renderer_composite
    assert stages["resblock"][0] == pytest.approx(2.0)  # (2+2)ms / 2 iters
    assert stages["resblock"][1] == pytest.approx(4.0)  # 8 GFLOP / 2
    assert stages["encoder_index"][0] == pytest.approx(0.5)
    assert stages["encoder_index"][2] == pytest.approx(1.0)  # 2 GB / 2
    assert stages["(outside scopes)"][0] == pytest.approx(0.05)
    # anonymous fusions of the same source+stage merge into one row
    assert per_op[("resblock", "x.py:1", "loop fusion")][1] == 2


def test_stage_of_prefers_deepest():
    assert profile_trace.stage_of(
        "jit(f)/model_inference/encoder_index/jit(g)/add"
    ) == "encoder_index"
    assert profile_trace.stage_of("jit(f)/mul") == "(outside scopes)"
    assert profile_trace.stage_of("") == "(no scope)"


def test_find_trace_file_and_load(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    p = d / "perfetto_trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": _trace()}, f)
    found = profile_trace.find_trace_file(str(tmp_path))
    assert found == str(p)
    events = profile_trace.load_perfetto(found)
    assert any(e.get("name") == "fusion.10" for e in events)


def test_report_runs(capsys):
    ops = profile_trace.device_op_events(_trace())
    stages, per_op = profile_trace.aggregate(ops)
    profile_trace.print_report(stages, per_op, top=5)
    out = capsys.readouterr().out
    assert "resblock" in out and "Top 5 ops" in out
