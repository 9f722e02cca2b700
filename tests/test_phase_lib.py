"""tools/flagship_phase_lib.sh retry/marker semantics, driven with a stub
train.py: transient failures with progress retry, no-progress failures
strike out after 3, and committed sidecar markers without checkpoints
(fresh clone) retrain instead of phantom-resuming."""

import json
import os
import stat
import subprocess
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "tools", "flagship_phase_lib.sh")

STUB = textwrap.dedent(
    """\
    #!/usr/bin/env python
    # stub train.py: behavior script read from STUB_PLAN, one line per
    # invocation: "<loglines> <save_epoch|-> <exit_code>"
    import json, os, sys
    plan_file = os.environ["STUB_PLAN"]
    count_file = plan_file + ".count"
    n = int(open(count_file).read()) if os.path.exists(count_file) else 0
    open(count_file, "w").write(str(n + 1))
    plan = open(plan_file).read().splitlines()
    loglines, save_epoch, code = plan[min(n, len(plan) - 1)].split()
    save_dir = sys.argv[sys.argv.index("--save_dir") + 1]
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "loss_log.txt"), "a") as f:
        for i in range(int(loglines)):
            f.write(f"stub line {i}\\n")
    if save_epoch != "-":
        os.makedirs(os.path.join(save_dir, "params"), exist_ok=True)
        with open(os.path.join(save_dir, "trainer_meta.json"), "w") as f:
            json.dump({"epoch": int(save_epoch)}, f)
    sys.exit(int(code))
    """
)

DRIVER = textwrap.dedent(
    """\
    #!/bin/bash
    set -euo pipefail
    cd "$WORK"
    OUT=$WORK/out
    COMMON=""
    . "$LIB"
    run_phase tphase "" "$EPOCHS"
    echo DRIVER_OK
    """
)


def run_lib(tmp_path, plan: str, epochs: int, pre=None):
    work = tmp_path / "work"
    work.mkdir(exist_ok=True)
    (work / "train.py").write_text(STUB)
    plan_file = work / "plan.txt"
    plan_file.write_text(plan)
    driver = work / "driver.sh"
    driver.write_text(DRIVER)
    driver.chmod(driver.stat().st_mode | stat.S_IEXEC)
    if pre:
        pre(work / "out" / "tphase")
    env = dict(
        os.environ,
        WORK=str(work),
        LIB=LIB,
        EPOCHS=str(epochs),
        STUB_PLAN=str(plan_file),
        STALL_TIMEOUT="3600",
    )
    # generous timeout: this 1-CPU box often runs the suite alongside a
    # TPU training host thread; each stub invocation spawns several
    # `python` startups that crawl under that contention
    return subprocess.run(
        ["bash", str(driver)], env=env, capture_output=True, text=True, timeout=600
    ), work / "out" / "tphase"


def test_transient_retry_then_complete(tmp_path):
    # bootstrap saves epoch 0; first main run makes one epoch of log progress
    # (11 lines) but dies rc=1 with no new checkpoint -> bounded soft retry;
    # second main run saves the target epoch and exits 0 -> phase completes
    plan = "0 0 0\n11 - 1\n11 2 0\n"
    r, phase_dir = run_lib(tmp_path, plan, epochs=2)
    assert "DRIVER_OK" in r.stdout, (r.stdout, r.stderr)
    assert "after log progress, no new checkpoint (soft strike 1/6)" in r.stdout
    assert (phase_dir / "PHASE_DONE").exists()
    assert json.loads((phase_dir / "trainer_meta.json").read_text())["epoch"] == 2


def test_checkpoint_progress_resets_soft_strikes(tmp_path):
    # failures that DID advance a checkpoint reset both budgets: alternate
    # save-then-die (checkpoint progress) with log-only-then-die five times —
    # more total failures than either cap, but never consecutive — then finish
    plan = "0 0 0\n" + "".join(
        # soft strike, then durable progress to epoch k (reset)
        f"11 - 1\n12 {k} 1\n" for k in range(1, 6)
    ) + "11 9 0\n"
    r, phase_dir = run_lib(tmp_path, plan, epochs=9)
    assert "DRIVER_OK" in r.stdout, (r.stdout, r.stderr)
    assert "after checkpoint progress" in r.stdout
    assert "soft strike 2/6" not in r.stdout
    assert (phase_dir / "PHASE_DONE").exists()


def test_soft_strikes_bound_deterministic_crash_loop(tmp_path):
    # a deterministic crash that replays >= one epoch of log lines every
    # retry but never advances a checkpoint must abort (bounded at 6), not
    # crash-loop forever
    plan = "0 0 0\n" + "20 - 1\n" * 10
    r, phase_dir = run_lib(tmp_path, plan, epochs=5)
    assert r.returncode == 1, (r.stdout, r.stderr)
    assert "soft strike 6/6" in r.stdout
    assert "repeated failures without checkpoint advance" in r.stdout
    assert not (phase_dir / "PHASE_DONE").exists()
    # exactly bootstrap + 6 soft-strike invocations ran
    count = (phase_dir.parent.parent / "plan.txt.count").read_text()
    assert count == "7", count


def test_no_progress_strikes_out(tmp_path):
    # bootstrap ok; main runs die immediately with no log lines -> 3 strikes
    plan = "0 0 0\n0 - 1\n0 - 1\n0 - 1\n"
    r, phase_dir = run_lib(tmp_path, plan, epochs=2)
    assert r.returncode == 1, (r.stdout, r.stderr)
    assert "strike 3/3" in r.stdout
    assert not (phase_dir / "PHASE_DONE").exists()


def test_phantom_markers_retrain(tmp_path):
    # committed PHASE_DONE/PHASE_TARGET/trainer_meta WITHOUT params/ (the
    # fresh-clone layout) must be ignored: the phase bootstraps from scratch
    def pre(phase_dir):
        os.makedirs(phase_dir, exist_ok=True)
        (phase_dir / "PHASE_DONE").write_text("")
        (phase_dir / "PHASE_TARGET").write_text("651")
        (phase_dir / "trainer_meta.json").write_text('{"epoch": 224}')

    plan = "0 0 0\n11 1 0\n"
    r, phase_dir = run_lib(tmp_path, plan, epochs=1, pre=pre)
    assert "DRIVER_OK" in r.stdout, (r.stdout, r.stderr)
    # target was recomputed from the real (stub) checkpoint, not the stale 651
    assert (phase_dir / "PHASE_TARGET").read_text().strip() == "2"
    assert (phase_dir / "PHASE_DONE").exists()
