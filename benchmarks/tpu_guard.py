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


def wait_for_backend(budget_s=None, probe_timeout_s=90, sleep_s=45):
    """Probe until the backend answers or the budget is spent.

    Budget default comes from ``BENCH_PROBE_BUDGET_S`` (seconds, 2700).
    Returns True when a probe succeeded.  On CPU (tests) the probe
    passes trivially — the guard is free there.
    """
    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_PROBE_BUDGET_S", "2700"))
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
                cwd=None):
    """Probe → run the real bench as a subprocess → emit ONE JSON line.

    On inner success (rc=0 + parseable final JSON line): refresh the
    last-good cache, print the line, exit 0.  On failure: re-probe and
    retry up to ``retries`` times.  If everything fails and a last-good
    cache exists, print it with ``"stale": true`` (honest, parseable)
    and exit 0; otherwise exit 1.
    """
    if inner_timeout_s is None:
        inner_timeout_s = float(os.environ.get("BENCH_INNER_TIMEOUT_S", "5400"))
    attempts = retries + 1
    for attempt in range(attempts):
        if not wait_for_backend():
            break  # budget spent probing; go stale
        _log(f"inner run attempt {attempt + 1}/{attempts}")
        try:
            r = subprocess.run(
                inner_argv,
                timeout=inner_timeout_s,
                cwd=cwd,
                stdout=subprocess.PIPE,
                stderr=None,  # stream bench progress to our stderr
            )
        except subprocess.TimeoutExpired:
            _log(f"inner run timed out after {inner_timeout_s:.0f}s")
            continue
        out = r.stdout.decode(errors="replace")
        line = next(
            (ln for ln in reversed(out.splitlines()) if ln.strip().startswith("{")),
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
            return 0
        _log(f"inner run failed rc={r.returncode}; tail: {out[-400:]!r}")
    cached = _load_json(cache_path)
    if cached is not None:
        cached["stale"] = True
        _log("backend unavailable; emitting last-good capture marked stale "
             f"(captured_at={cached.get('captured_at')})")
        print(json.dumps(cached), flush=True)
        return 0
    _log("backend unavailable and no last-good cache; failing")
    return 1
