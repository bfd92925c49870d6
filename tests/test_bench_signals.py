"""The bench's SIGNAL contract, driven as a real subprocess.

The driver kills bench.py when its round budget expires; the round's
evidence depends on what the dying process leaves on the pipe.  The
contract (SURVEY.md §7 driver-provability; VERDICT r3 item 1):

* SIGTERM/SIGALRM AFTER the headline JSON is out → the handler writes
  one final complete JSON line (async-signal-safe ``os.write`` — a
  buffered print inside a handler can raise "reentrant call" and lose
  the line) with a ``<signal …>`` marker in ``skipped_arms``, then
  exits 0.
* SIGTERM BEFORE the headline (required arm still compiling) → exit 3
  with no JSON: the alarm backstop must not be armed yet, and there is
  nothing useful to emit.

In-process tests can't exercise real delivery + process exit codes, so
this drives bench.main() in a subprocess on the tiny config.  Two
robustness disciplines for the one-core host (CLAUDE.md: a TPU run
sharing the core stretches timings ~3x):

* signal delivery is synchronized on bench.main()'s "signal handlers
  installed" marker line, never on a fixed sleep — the lazy
  smmdax.train import before handler installation takes ~1.5 s idle
  and multiples of that under load;
* stdout is pumped by a reader thread into a queue so every read
  honors its deadline — a silently wedged subprocess (readline blocks
  forever) must fail the test, not hang the suite.
"""

import json
import os
import queue
import signal
import subprocess
import sys
import threading
import time

from test_bench import _json_lines  # shared JSON-line parser

_DRIVER = r"""
import sys, time
sys.path.insert(0, {repo!r})
import bench
from smmdax.configs import Config

def _tiny(batch_size=8, k=1):
    return Config(model="sn-smmd", kernel="rq", architecture="dcgan",
                  dataset="synthetic", output_size=32, batch_size=8,
                  real_batch_size=8, gf_dim=8, df_dim=8, dof_dim=4,
                  z_dim=8, dsteps=1, gsteps=1, random_seed=0,
                  steps_per_dispatch=2)

bench._flagship_cfg = _tiny
bench.HEADLINE_K = 2; bench.HOST_K = 2
bench.HEADLINE_BATCH = 8; bench.POOL_SAMPLES = 64
bench.SAMPLING_BATCH = 8; bench.DISPATCH_SWEEP = (); bench.BATCH_SWEEP = ()
bench.N_WINDOWS = 2; bench.STEPS_PER_WINDOW = 2; bench.WARMUP_STEPS = 1
bench.BUDGET_S = 10_000_000.0
mode = sys.argv[1]
if mode == "hang_optional":      # signal lands mid-OPTIONAL-arm
    bench._measure_sampling = lambda *a, **k: time.sleep(600)
elif mode == "hang_required":    # signal lands mid-REQUIRED-arm
    bench._measure_device_resident = lambda *a, **k: time.sleep(600)
bench.main()
"""

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_HANDLERS_MARKER = "signal handlers installed"


def _pump(proc, q):
    for line in iter(proc.stdout.readline, b""):
        q.put(line.decode())
    q.put(None)


def _launch(mode, tmp_path):
    script = tmp_path / "drive.py"
    script.write_text(_DRIVER.format(repo=_REPO))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen([sys.executable, str(script), mode],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL,
                            env=env, cwd=_REPO)
    q = queue.Queue()
    threading.Thread(target=_pump, args=(proc, q), daemon=True).start()
    return proc, q


def _read_until(q, predicate, timeout_s):
    """Consume pumped stdout lines until predicate(lines), EOF, or the
    deadline — enforced even when the subprocess goes silent."""
    lines = []
    deadline = time.time() + timeout_s
    while True:
        wait = deadline - time.time()
        if wait <= 0:
            return lines
        try:
            line = q.get(timeout=min(1.0, wait))
        except queue.Empty:
            continue
        if line is None:  # EOF: subprocess exited
            return lines
        lines.append(line)
        if predicate(lines):
            return lines


def _drain(q, timeout_s=60.0):
    """Collect remaining output after the process exited."""
    return _read_until(q, lambda ls: False, timeout_s)


def test_sigterm_after_headline_emits_final_json_and_exits_zero(tmp_path):
    proc, q = _launch("hang_optional", tmp_path)
    try:
        lines = _read_until(q, lambda ls: bool(
            _json_lines("".join(ls))), timeout_s=600)
        assert _json_lines("".join(lines)), "headline never appeared"
        time.sleep(1.0)  # let it settle into the hanging optional arm
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
        lines += _drain(q)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0
    emitted = _json_lines("".join(lines))
    assert len(emitted) >= 2, "bail line missing after SIGTERM"
    last = emitted[-1]
    assert last["value"] == emitted[0]["value"] > 0
    assert any("signal" in s for s in last["skipped_arms"])


def test_sigterm_before_headline_exits_three_without_json(tmp_path):
    proc, q = _launch("hang_required", tmp_path)
    try:
        # synchronize on handler installation (printed by bench.main()
        # right after signal.signal) — a fixed sleep races the lazy
        # smmdax.train import on a loaded host
        lines = _read_until(
            q, lambda ls: any(_HANDLERS_MARKER in l for l in ls),
            timeout_s=600)
        assert any(_HANDLERS_MARKER in l for l in lines)
        time.sleep(0.5)  # usually inside the hanging required arm now
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
        lines += _drain(q)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 3
    assert not _json_lines("".join(lines)), "nothing useful existed to emit"
