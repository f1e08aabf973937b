"""bench.py budget machinery (no TPU needed — pure control flow).

Round 3 lost its official perf record to an all-or-nothing bench
(BENCH_r03.json: rc=124, empty tail); these tests pin the three behaviors
that prevent a repeat:

1. the ONE JSON line is emitted from whatever has finished (even nothing);
2. the batch-size ladder steps down on OOM inside one process and stops
   retrying past its deadline;
3. stage subprocesses receive a COOPERATIVE ``deadline=`` kwarg and only
   get killed after a grace window (a mid-device-program SIGKILL wedges
   the shared TPU tunnel for many minutes — measured in PERF.md).
"""
from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, ".")  # repo root (bench.py lives there, not in the package)
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_report(monkeypatch):
    monkeypatch.setitem(bench._REPORT, "printed", False)
    monkeypatch.setitem(bench._REPORT, "details", {})
    monkeypatch.setitem(bench._REPORT, "train_ips", None)


def _emitted_line(capsys) -> dict:
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"exactly ONE JSON line, got {len(out)}"
    return json.loads(out[0])


def test_emit_json_with_nothing_finished(capsys):
    bench._emit_json()
    obj = _emitted_line(capsys)
    assert obj["value"] is None and obj["vs_baseline"] is None
    assert obj["unit"] == "imgs/sec/chip"
    # a second call must not print a second line (signal + normal paths race)
    bench._emit_json()
    assert capsys.readouterr().out == ""


def test_emit_json_with_partial_results(capsys):
    bench._REPORT["train_ips"] = 26.6
    bench._REPORT["details"]["train_batch"] = 8
    bench._emit_json()
    obj = _emitted_line(capsys)
    assert obj["value"] == 26.6
    assert obj["vs_baseline"] == pytest.approx(26.6 / 5.0, abs=0.01)
    assert obj["details"]["train_batch"] == 8


def test_auto_ladder_steps_down_on_oom(monkeypatch):
    calls = []

    def fake(bs, iters, seg_model, remat, remat_mode, fused_attention,
             deadline=None):
        calls.append((bs, deadline))
        if bs > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating")
        return 20.0, 0.2, 0.4, 9.0

    monkeypatch.setattr(bench, "bench_train_step", fake)
    ips, dt, mfu, hbm, bs = bench.bench_train_step_auto((8, 4, 2), deadline=300)
    assert bs == 4 and ips == 20.0
    assert [c[0] for c in calls] == [8, 4]
    # the remaining (not the original) deadline is threaded to each rung
    assert calls[0][1] is not None and calls[0][1] <= 300
    assert calls[1][1] is not None and calls[1][1] <= calls[0][1]


def test_auto_ladder_nonmemory_error_raises(monkeypatch):
    def fake(*a, **k):
        raise RuntimeError("INVALID_ARGUMENT: something else")

    monkeypatch.setattr(bench, "bench_train_step", fake)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        bench.bench_train_step_auto((8, 4))


def test_auto_ladder_stops_retrying_past_deadline(monkeypatch):
    calls = []

    def fake(bs, *a, **k):
        calls.append(bs)
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "bench_train_step", fake)
    # deadline already elapsed -> the first OOM is final, no pointless rungs
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench.bench_train_step_auto((8, 4, 2), deadline=-1)
    assert calls == [8]


def test_deadline_helpers():
    assert bench._t_end(None) is None
    assert not bench._past(None)
    assert bench._past(bench._t_end(-5))
    assert not bench._past(bench._t_end(60))


def test_subprocess_forwards_cooperative_deadline():
    """The child receives deadline= as a kwarg and the parent parses the
    BENCH_RESULT line. Uses this very test module's echo helper below via
    bench's own subprocess protocol."""
    r = bench._run_in_subprocess("_echo_deadline_for_test", 47.0, 3, x=2)
    args, kwargs = r
    assert args == [3]
    assert kwargs["x"] == 2
    assert kwargs["deadline"] == pytest.approx(47.0, abs=0.2)
