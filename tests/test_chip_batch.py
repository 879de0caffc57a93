"""tools/r4_chip_batch.sh retry harness: each probe step must survive
transient tunnel failures (the axon tunnel both errors and hangs —
CLAUDE.md), keep stdout artifacts pure JSON for the converters, and
report honest failure after exhausting attempts.

Runs the real script under a PATH-stubbed ``python`` that fails on the
first invocation of each distinct command line and succeeds after, so
every step exercises the retry path without touching jax or the chip.
"""
import os
import stat
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH = os.path.join(REPO, "tools", "r4_chip_batch.sh")

# fails the FIRST time each distinct arg-vector is seen, then emits one
# JSON line; `python -` (the converter heredocs) passes through to the
# real interpreter so the .jsonl -> .json summarisation is tested too
STUB = """#!/bin/bash
if [ "$1" = "-" ]; then exec {real} "$@"; fi
tag=$(echo "$*" | tr ' /.' '___')
marker="{tmp}/seen_$tag"
if [ ! -f "$marker" ]; then touch "$marker"; echo "transient tunnel error" >&2; exit 1; fi
echo '{{"ok": 1}}'
"""


@pytest.fixture
def stub_env(tmp_path):
    """A sandbox dir with the stub python, tool placeholders, and a
    PATH that resolves ``python`` to the stub."""
    (tmp_path / "tools").mkdir()
    for name in (
        "int8_probe.py",
        "quant_experiment.py",
        "stem_hm_experiment.py",
        "nms_probe.py",
        "roofline.py",
    ):
        (tmp_path / "tools" / name).touch()
    (tmp_path / "bench.py").touch()
    stub = tmp_path / "python"
    stub.write_text(STUB.format(real=os.path.realpath(sys_executable()), tmp=tmp_path))
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    # speed: shrink the retry/bench backoffs
    script = open(BATCH).read().replace("sleep 120", "sleep 0").replace(
        "sleep 180", "sleep 0"
    )
    (tmp_path / "tools" / "r4_chip_batch.sh").write_text(script)
    env = dict(os.environ, PATH=f"{tmp_path}:{os.environ['PATH']}")
    return tmp_path, env


def sys_executable():
    import sys

    return sys.executable


def test_every_step_retries_through_one_transient_failure(stub_env):
    tmp_path, env = stub_env
    out = subprocess.run(
        ["bash", "tools/r4_chip_batch.sh"],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    log = out.stdout
    for step in (
        "int8_probe",
        "quant_e2e",
        "stem_hm",
        "nms_probe",
        "train_roofline",
        "train_fused_roofline",
        "train_rot_roofline",
    ):
        assert f"{step} failed rc=1 (attempt 1/3)" in log, (step, log)
        assert f"{step} ok (attempt 2)" in log, (step, log)
    assert "FAILED after 3 attempts" not in log
    # converters produced the judge-facing .json artifacts from pure stdout
    import json

    probe = json.load(open(tmp_path / "INT8_PROBE.json"))
    assert probe["rows"] == [{"ok": 1}]
    stem = json.load(open(tmp_path / "STEM_HM_PROBE.json"))
    assert stem == {"ok": 1}
    # bench retried once and captured the successful line
    assert (tmp_path / "bench_r4.log").read_text().strip() == '{"ok": 1}'


def test_step_fails_honestly_after_three_attempts(stub_env, tmp_path):
    tmp_path, env = stub_env
    # a stub that always fails: replace the marker logic wholesale
    (tmp_path / "python").write_text("#!/bin/bash\necho nope >&2\nexit 7\n")
    out = subprocess.run(
        [
            "bash",
            "-c",
            # drive run_step alone (sourcing just the helpers via a
            # wrapper script keeps this independent of step ordering)
            'source /dev/stdin <<\'SH\'\n'
            + _helpers_only()
            + "\nSH\nrun_step demo 10 out.txt python whatever.py",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 1
    assert "demo failed rc=7 (attempt 3/3)" in out.stdout
    assert "demo FAILED after 3 attempts" in out.stdout


def _helpers_only() -> str:
    """Extract only the log()/run_step() definitions (brace-balanced,
    from the definition line to its closing brace at column 0)."""
    lines = open(BATCH).read().splitlines()
    keep, active = [], False
    for ln in lines:
        if ln.startswith("log()") or ln.startswith("run_step()"):
            active = True
        if active:
            keep.append(ln.replace("sleep 120", "sleep 0"))
            if ln == "}":
                active = False
    return "\n".join(keep)
