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
        return 20.0, 0.2, 0.4, 9.0, {"setup": 1.0}

    monkeypatch.setattr(bench, "bench_train_step", fake)
    ips, dt, mfu, hbm, bs, phases = bench.bench_train_step_auto((8, 4, 2), deadline=300)
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


def _fake_stage_results():
    """fn_name -> plausible return tuple for _run_in_subprocess fakes."""
    ph = {"setup": 60.0, "compile_load": 120.0, "measure": 15.0}
    return {
        "bench_train_step_auto": [30.0, 0.26, 0.45, 16.0, 8, ph],
        "bench_pseudo_gen": [27.0, 0.30, 0.22, 61.0, 0.51, ph],
        "bench_eval": [53.0, 0.15, 0.046, ph],
    }


def test_pseudo_gen_stage_deadline_is_capped(monkeypatch):
    """A degraded-tunnel pseudo-gen must not be handed the entire remaining
    budget (that starved the B5 + eval stretch stages in round 4)."""
    calls = []
    results = _fake_stage_results()

    def fake(fn_name, timeout, *args, **kwargs):
        calls.append((fn_name, timeout))
        return results[fn_name]

    monkeypatch.setattr(bench, "_run_in_subprocess", fake)
    bench._main_stages(bench._Budget(1200.0))
    by_name = {}
    for name, timeout in calls:
        by_name.setdefault(name, timeout)
    cap = max(300.0, bench.PSEUDO_GEN_BUDGET_FRACTION * 1200.0)
    assert by_name["bench_pseudo_gen"] <= cap
    # eval is capped too — a degraded-tunnel eval must not starve the
    # mandatory pseudo-gen metric behind it
    assert by_name["bench_eval"] <= max(240.0, 0.2 * 1200.0)
    # train (the headline) keeps the uncapped remaining-budget deadline
    assert by_name["bench_train_step_auto"] > cap
    # all four stages ran, greedy-by-cost after train: eval (cheapest
    # executable) first, capped pseudo-gen, then the B5 stretch (44 MB
    # executable, 150-420 s load) last — round 5 measured a degraded
    # tunnel putting 640-900 s into the pseudo child's compile_load alone,
    # which lost the eval metric under the old eval-after-pseudo order
    assert [c[0] for c in calls] == [
        "bench_train_step_auto", "bench_eval",
        "bench_pseudo_gen", "bench_train_step_auto",
    ]


@pytest.mark.parametrize("fail_at,expect_ran", [
    ("bench_eval", ["bench_train_step_auto", "bench_eval"]),
    ("bench_pseudo_gen", ["bench_train_step_auto", "bench_eval",
                          "bench_pseudo_gen"]),
])
def test_abandoned_child_skips_later_stages(monkeypatch, fail_at, expect_ran):
    """An abandoned child keeps running ON the chip; later stages would
    measure tunnel contention, not capability — they must be skipped."""
    calls = []
    results = _fake_stage_results()

    def fake(fn_name, timeout, *args, **kwargs):
        calls.append(fn_name)
        if fn_name == fail_at:
            raise RuntimeError(
                f"{fn_name} exceeded deadline+grace — abandoned to finish "
                "in background (pid 12345); not killed"
            )
        return results[fn_name]

    monkeypatch.setattr(bench, "_run_in_subprocess", fake)
    bench._main_stages(bench._Budget(1200.0))
    assert calls == expect_ran
    assert "skipped_after_abandoned_child" in bench._REPORT["details"]
    # the flagship number still lands in the JSON line
    assert bench._REPORT["train_ips"] == 30.0


def test_ordinary_stage_failure_does_not_skip_later_stages(monkeypatch):
    """Only ABANDONMENT poisons the chip; a clean child failure (e.g. OOM
    at every rung) must not cost the remaining stages."""
    calls = []
    results = _fake_stage_results()

    def fake(fn_name, timeout, *args, **kwargs):
        calls.append(fn_name)
        if fn_name == "bench_pseudo_gen":
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return results[fn_name]

    monkeypatch.setattr(bench, "_run_in_subprocess", fake)
    bench._main_stages(bench._Budget(1200.0))
    assert calls == [
        "bench_train_step_auto", "bench_eval",
        "bench_pseudo_gen", "bench_train_step_auto",
    ]
    assert "skipped_after_abandoned_child" not in bench._REPORT["details"]


def test_overrun_child_waited_out_while_budget_remains(monkeypatch):
    """A child that overruns deadline+grace is WAITED OUT, not abandoned,
    while the global budget still has room: the cooperative child exits by
    itself shortly, and abandoning it would cost every later stage (round 5:
    a cold-cache pseudo-gen compile overran its stage deadline with ~500 s
    of budget left and lost the eval + B5 metrics)."""
    monkeypatch.setattr(bench, "CHILD_GRACE_S", 0.2)
    r = bench._run_in_subprocess(
        "_sleep_echo_for_test", 0.1, 3.0, budget=bench._Budget(120.0)
    )
    args, _kwargs = r
    assert args == [3.0]


def test_overrun_child_abandoned_when_budget_exhausted(monkeypatch):
    """With no global budget room left (or no budget handle at all), the
    overrun child is abandoned as before — never killed."""
    monkeypatch.setattr(bench, "CHILD_GRACE_S", 0.2)
    with pytest.raises(RuntimeError, match="abandoned"):
        bench._run_in_subprocess(
            "_sleep_echo_for_test", 0.1, 8.0, budget=bench._Budget(30.0)
        )
    with pytest.raises(RuntimeError, match="abandoned"):
        bench._run_in_subprocess("_sleep_echo_for_test", 0.1, 8.0)


def test_subprocess_forwards_cooperative_deadline():
    """The child receives deadline= as a kwarg and the parent parses the
    BENCH_RESULT line. Uses this very test module's echo helper below via
    bench's own subprocess protocol."""
    r = bench._run_in_subprocess("_echo_deadline_for_test", 47.0, 3, x=2)
    args, kwargs = r
    assert args == [3]
    assert kwargs["x"] == 2
    assert kwargs["deadline"] == pytest.approx(47.0, abs=0.2)
