"""bench.py tunnel-resilience supervisor (VERDICT r3 next#1): fresh
child process per attempt (JAX memoizes backend-init failures
process-wide), bounded retries, only the successful child's stdout is
forwarded, rc stays honest."""
import importlib.util
import json
import os
import subprocess
import sys
import types

import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GOOD_LINES = (
    json.dumps({"metric": "a", "value": 1.0, "unit": "x", "vs_baseline": 1})
    + "\n"
    + json.dumps({"metric": "b", "value": 2.0, "unit": "x", "vs_baseline": 2})
    + "\n"
)


def test_is_metric_line():
    bench = _load_bench()
    assert bench._is_metric_line(GOOD_LINES.splitlines()[0])
    assert not bench._is_metric_line("WARNING: platform axon is experimental")
    assert not bench._is_metric_line('{"no_metric": 1}')
    assert not bench._is_metric_line("not json")


def test_supervise_success_first_attempt(monkeypatch, capsys):
    bench = _load_bench()
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        assert kw["env"][bench._CHILD_ENV] == "1"
        return subprocess.CompletedProcess(
            cmd, 0, stdout="WARN noise\n" + GOOD_LINES, stderr="w\n"
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._supervise() == 0
    out = capsys.readouterr().out
    # only metric lines forwarded, noise dropped
    assert all(bench._is_metric_line(l) for l in out.strip().splitlines())
    assert len(out.strip().splitlines()) == 2
    assert len(calls) == 1


def test_supervise_retries_transient_failure(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    attempts = []

    def fake_run(cmd, **kw):
        attempts.append(1)
        if len(attempts) < 3:
            return subprocess.CompletedProcess(
                cmd, 1, stdout="",
                stderr="RuntimeError: Unable to initialize backend 'axon': "
                       "UNAVAILABLE\n",
            )
        return subprocess.CompletedProcess(cmd, 0, stdout=GOOD_LINES, stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._supervise() == 0
    assert len(attempts) == 3
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["metric"] == "b"


def test_supervise_rc1_when_all_attempts_fail(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(cmd, **kw):
        # partial output (one metric line then crash) must NOT count
        return subprocess.CompletedProcess(
            cmd, 1, stdout=GOOD_LINES.splitlines()[0] + "\n", stderr="boom\n"
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._supervise() == 1


def test_supervise_total_deadline_caps_hang_retries(monkeypatch):
    """Hanging attempts consume the total deadline: the supervisor must
    stop early instead of burning ATTEMPTS x ATTEMPT_TIMEOUT of driver
    wall-clock."""
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    attempts = []

    def fake_run(cmd, **kw):
        attempts.append(kw["timeout"])
        clock["t"] += kw["timeout"]  # the child hung for its whole budget
        raise subprocess.TimeoutExpired(cmd, kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._supervise() == 1
    assert sum(attempts) <= bench.TOTAL_DEADLINE_S + 240
    assert len(attempts) < bench.ATTEMPTS


def test_supervise_handles_hang_timeout(monkeypatch):
    """A hung child (tunnel black-holes jax.devices()) is killed by the
    per-attempt timeout instead of erasing the round's benchmark."""
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    attempts = []

    def fake_run(cmd, **kw):
        attempts.append(1)
        assert kw["timeout"] == bench.ATTEMPT_TIMEOUT_S
        raise subprocess.TimeoutExpired(cmd, kw["timeout"], stderr="hung")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._supervise() == 1
    assert len(attempts) == bench.ATTEMPTS
