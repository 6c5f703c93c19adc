"""Bench-artifact robustness (VERDICT r4 #1).

Round 4's driver bench artifact ended rc=124 with `parsed: null` because
bench.py printed the headline JSON only at the very end of main(), after two
fallible subprocess legs — the already-measured batch-1 number died with the
process. These tests run bench.py in smoke mode (tiny model, CPU) and assert
the structural fixes:

- the headline record is emitted IMMEDIATELY after the batch-1 measurement,
  so it survives any later leg being killed;
- the global deadline (`LUMINA_BENCH_DEADLINE`) skips optional legs with a
  visible `skipped (deadline)` note instead of starting them;
- the last JSON line is always a parseable headline with spread fields
  (VERDICT r4 #7).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=600, kill_after_first_json=False):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["LUMINA_BENCH_SMOKE"] = "1"
    env.update(env_extra)
    if not kill_after_first_json:
        proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                              text=True, timeout=timeout, cwd=REPO, env=env)
        return proc.returncode, proc.stdout, proc.stderr
    # simulate the driver killing the bench mid-run: SIGKILL the process the
    # moment the first JSON line appears, then check that line alone is a
    # complete headline record
    p = subprocess.Popen([sys.executable, BENCH], stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True, cwd=REPO,
                         env=env)
    first = None
    t0 = time.time()
    try:
        for line in p.stdout:
            if line.strip().startswith("{"):
                first = line
                break
            if time.time() - t0 > timeout:
                break
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=30)
    return None, first or "", ""


def _last_headline(stdout):
    last = None
    for line in stdout.strip().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "metric" in d:
            last = d
    return last


@pytest.mark.slow
def test_deadline_zero_still_produces_headline():
    """Deadline already expired -> every optional leg skipped, rc=0, and the
    last JSON line is a full headline record (the r4 failure shape can no
    longer occur)."""
    rc, out, err = _run({"LUMINA_BENCH_DEADLINE": "0"})
    assert rc == 0, (out, err)
    rec = _last_headline(out)
    assert rec is not None, out
    assert rec["value"] > 0 and rec["unit"] == "samples/sec"
    assert rec["best_batch"] == 1
    assert "batch1_dt_min_s" in rec and "batch1_spread_pct" in rec
    assert "skipped (deadline)" in err


@pytest.mark.slow
def test_kill_after_first_json_leaves_complete_record():
    """The FIRST emitted JSON line is already a complete headline — a driver
    kill at any later point leaves a parseable artifact."""
    _, first, _ = _run({"LUMINA_BENCH_DEADLINE": "3600"},
                       kill_after_first_json=True)
    rec = json.loads(first)
    assert rec["unit"] == "samples/sec" and rec["value"] > 0
    assert "batch1_samples_per_sec" in rec and "batch1_dt_min_s" in rec


@pytest.mark.slow
def test_full_smoke_run_records_batch_leg():
    """With budget, the subprocess batch legs run and the final headline
    carries the batch-scaling datapoint + spread fields."""
    rc, out, err = _run({"LUMINA_BENCH_DEADLINE": "3600"})
    assert rc == 0, (out, err)
    rec = _last_headline(out)
    assert rec is not None
    got_leg = any(k.startswith("batch4") or k.startswith("batch2")
                  for k in rec if k.endswith("_samples_per_sec"))
    assert got_leg, rec
