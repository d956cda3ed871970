"""Wedge-proof backend init for benchmark entry points.

The axon TPU tunnel intermittently wedges: the first backend touch
(``jax.devices()`` / first transfer) blocks forever INSIDE PJRT client
init, or raises ``UNAVAILABLE``.  Round 3's driver bench died exactly
this way (BENCH_r03.json rc=1) because ``bench.py`` touched the backend
with no probe.  This module gives every bench the CLAUDE.md probe
protocol:

- ``wait_for_backend(budget_s)``: run a tiny matmul in a SUBPROCESS with
  a 90s timeout (the hang is inside PJRT init, so only a subprocess can
  be timed out), retrying with sleep until the budget is spent.
- ``run_guarded(argv)``: outer-process harness for driver-invoked
  benches.  The outer process never imports jax; it probes, runs the
  real bench as a subprocess, retries once across a fresh probe on
  failure (transient UNAVAILABLE / wedge mid-run), and keeps a
  last-good results cache so a wedge that outlives the whole budget
  degrades the capture to a clearly-marked ``"stale": true`` row
  instead of rc=1.

Reference analog: every published reference number is a captured
measurement (PERFORMANCE_EVALUATION_LATEST.md:50-68); the capture
pipeline itself must not be the single point of failure.
"""

import json
import os
import signal
import subprocess
import sys
import time

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))"
)


def _log(*a):
    print("tpu_guard:", *a, file=sys.stderr, flush=True)


def probe_once(timeout_s=90):
    """One subprocess probe: True iff a tiny matmul completes in time."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(budget_s=None, probe_timeout_s=90, sleep_s=30):
    """Probe until the backend answers or the budget is spent.

    Budget default comes from ``BENCH_PROBE_BUDGET_S`` (seconds, 480 —
    MUST stay well under the driver's ~30-min timeout or the stale
    fallback in ``run_guarded`` is unreachable; BENCH_r04.json's rc=124
    was exactly that: a 2700-s probe budget SIGKILLed 13 probes in).
    Returns True when a probe succeeded.  On CPU (tests) the probe
    passes trivially — the guard is free there.
    """
    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_PROBE_BUDGET_S", "480"))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        if probe_once(probe_timeout_s):
            _log(f"backend up (probe {attempt}, {time.time() - t0:.0f}s)")
            return True
        if time.time() >= deadline:
            _log(f"budget exhausted after {attempt} probes; backend down")
            return False
        _log(f"probe {attempt} failed ({time.time() - t0:.0f}s); retrying")
        time.sleep(max(0.0, min(sleep_s, deadline - time.time())))


def _load_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def save_last_good(payload, path):
    """Atomically persist the last successful bench JSON (committed)."""
    payload = dict(payload)
    payload["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    os.replace(tmp, path)


def run_guarded(inner_argv, cache_path, inner_timeout_s=None, retries=1,
                cwd=None, total_budget_s=None):
    """Probe → run the real bench as a subprocess → emit ONE JSON line.

    On inner success (rc=0 + parseable final JSON line): refresh the
    last-good cache, print the line, exit 0.  On failure: re-probe and
    retry up to ``retries`` times.  If everything fails and a last-good
    cache exists, print it with ``"stale": true`` (honest, parseable)
    and exit 0; otherwise exit 1.

    Every phase (probes, inner runs, retries) is clipped to ONE total
    deadline — ``BENCH_TOTAL_BUDGET_S`` (default 1500 s), chosen to sit
    under the driver's observed ~30-min SIGKILL — so the stale fallback
    ALWAYS fires before the driver gives up.  A SIGTERM handler emits
    the stale line too, as insurance against an external `timeout`
    killing us first (rc=124 in BENCH_r04.json).
    """
    if total_budget_s is None:
        total_budget_s = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1500"))
    deadline = time.time() + total_budget_s
    state = {"emitted": False}

    def _emit_stale():
        """Print the last-good capture marked stale; rc 0 if one exists."""
        if state["emitted"]:
            return 0
        cached = _load_json(cache_path)
        if cached is not None:
            cached["stale"] = True
            _log("backend unavailable; emitting last-good capture marked "
                 f"stale (captured_at={cached.get('captured_at')})")
            print(json.dumps(cached), flush=True)
            state["emitted"] = True
            return 0
        _log("backend unavailable and no last-good cache; failing")
        return 1

    def _on_term(signum, frame):
        _log(f"caught signal {signum}; emitting stale fallback now")
        os._exit(0 if _emit_stale() == 0 else 1)

    try:
        prev_term = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # not the main thread (tests) — skip the handler
        prev_term = None
    try:
        attempts = retries + 1
        for attempt in range(attempts):
            probe_budget = min(
                float(os.environ.get("BENCH_PROBE_BUDGET_S", "480")),
                deadline - time.time() - 60.0,
            )
            if probe_budget <= 0 or not wait_for_backend(budget_s=probe_budget):
                break  # budget spent probing; go stale
            if inner_timeout_s is None:
                to = float(os.environ.get("BENCH_INNER_TIMEOUT_S", "5400"))
            else:
                to = inner_timeout_s
            to = min(to, deadline - time.time() - 15.0)
            if to < 30:
                break  # no time left for a meaningful inner run
            _log(f"inner run attempt {attempt + 1}/{attempts} "
                 f"(timeout {to:.0f}s)")
            try:
                r = subprocess.run(
                    inner_argv,
                    timeout=to,
                    cwd=cwd,
                    stdout=subprocess.PIPE,
                    stderr=None,  # stream bench progress to our stderr
                )
            except subprocess.TimeoutExpired:
                _log(f"inner run timed out after {to:.0f}s")
                continue
            out = r.stdout.decode(errors="replace")
            line = next(
                (ln for ln in reversed(out.splitlines())
                 if ln.strip().startswith("{")),
                None,
            )
            if r.returncode == 0 and line is not None:
                try:
                    payload = json.loads(line)
                except Exception:
                    _log("final line not JSON; treating as failure")
                    continue
                save_last_good(payload, cache_path)
                print(json.dumps(payload), flush=True)
                state["emitted"] = True
                return 0
            _log(f"inner run failed rc={r.returncode}; tail: {out[-400:]!r}")
        return _emit_stale()
    finally:
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)
