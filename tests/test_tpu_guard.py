"""Unit tests for the wedge-proof bench harness (benchmarks/tpu_guard.py).

VERDICT r3 #1: one tunnel wedge must delay, not destroy, the driver
capture — bench.py's outer process probes first, retries once, and
degrades to a stale-marked last-good JSON line instead of rc=1.
All backend touches are stubbed; nothing here talks to a device.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
import tpu_guard  # noqa: E402


def test_wait_for_backend_success(monkeypatch):
    calls = []
    monkeypatch.setattr(tpu_guard, "probe_once",
                        lambda timeout_s=90: calls.append(1) or True)
    assert tpu_guard.wait_for_backend(budget_s=10) is True
    assert len(calls) == 1


def test_wait_for_backend_budget_exhausted(monkeypatch):
    monkeypatch.setattr(tpu_guard, "probe_once", lambda timeout_s=90: False)
    monkeypatch.setattr(tpu_guard.time, "sleep", lambda s: None)
    assert tpu_guard.wait_for_backend(budget_s=0.0) is False


def test_wait_for_backend_recovers_midway(monkeypatch):
    seq = iter([False, False, True])
    monkeypatch.setattr(tpu_guard, "probe_once",
                        lambda timeout_s=90: next(seq))
    monkeypatch.setattr(tpu_guard.time, "sleep", lambda s: None)
    assert tpu_guard.wait_for_backend(budget_s=1e9) is True


def _run(capsys, monkeypatch, tmp_path, inner_script, probe=True,
         seed_cache=None, retries=1):
    monkeypatch.setattr(tpu_guard, "wait_for_backend", lambda **kw: probe)
    cache = str(tmp_path / "last_good.json")
    if seed_cache is not None:
        with open(cache, "w") as f:
            json.dump(seed_cache, f)
    rc = tpu_guard.run_guarded(
        [sys.executable, "-c", inner_script], cache_path=cache,
        inner_timeout_s=60, retries=retries)
    out = capsys.readouterr().out.strip()
    return rc, (json.loads(out) if out else None), cache


def test_run_guarded_success_saves_cache(capsys, monkeypatch, tmp_path):
    rc, payload, cache = _run(
        capsys, monkeypatch, tmp_path,
        "print('progress noise'); print('{\"metric\": \"m\", \"value\": 7}')")
    assert rc == 0
    assert payload["metric"] == "m" and payload["value"] == 7
    assert "stale" not in payload
    saved = json.load(open(cache))
    assert saved["value"] == 7 and "captured_at" in saved


def test_run_guarded_failure_emits_stale_cache(capsys, monkeypatch, tmp_path):
    rc, payload, _ = _run(
        capsys, monkeypatch, tmp_path, "import sys; sys.exit(3)",
        seed_cache={"metric": "m", "value": 5, "captured_at": "x"},
        retries=0)
    assert rc == 0
    assert payload["stale"] is True and payload["value"] == 5


def test_run_guarded_failure_no_cache_rc1(capsys, monkeypatch, tmp_path):
    rc, payload, _ = _run(
        capsys, monkeypatch, tmp_path, "import sys; sys.exit(3)", retries=0)
    assert rc == 1
    assert payload is None


def test_run_guarded_probe_dead_goes_stale(capsys, monkeypatch, tmp_path):
    rc, payload, _ = _run(
        capsys, monkeypatch, tmp_path, "print('{\"value\": 1}')",
        probe=False, seed_cache={"value": 2})
    assert rc == 0
    assert payload["stale"] is True and payload["value"] == 2


def test_run_guarded_retries_after_transient_failure(capsys, monkeypatch,
                                                     tmp_path):
    flag = tmp_path / "flag"
    script = (
        "import os, sys\n"
        f"p = {str(flag)!r}\n"
        "if not os.path.exists(p):\n"
        "    open(p, 'w').close(); sys.exit(2)\n"
        "print('{\"value\": 9}')\n"
    )
    rc, payload, _ = _run(capsys, monkeypatch, tmp_path, script, retries=1)
    assert rc == 0
    assert payload["value"] == 9 and "stale" not in payload


def test_run_guarded_rejects_non_json_final_line(capsys, monkeypatch,
                                                 tmp_path):
    rc, payload, _ = _run(
        capsys, monkeypatch, tmp_path, "print('{not json')",
        seed_cache={"value": 4}, retries=0)
    assert rc == 0
    assert payload["stale"] is True and payload["value"] == 4


def test_dead_backend_emits_stale_within_budget(capsys, monkeypatch,
                                                tmp_path):
    """VERDICT r4 #1: a dead tunnel must produce a parseable stale line
    BEFORE the driver timeout — real wait_for_backend, probes always
    failing, tiny total budget; assert the line lands in seconds."""
    import time as _time
    monkeypatch.setattr(tpu_guard, "probe_once", lambda timeout_s=90: False)
    monkeypatch.setenv("BENCH_TOTAL_BUDGET_S", "3")
    monkeypatch.setenv("BENCH_PROBE_BUDGET_S", "1")
    cache = str(tmp_path / "last_good.json")
    with open(cache, "w") as f:
        json.dump({"metric": "m", "value": 11, "captured_at": "x"}, f)
    t0 = _time.time()
    rc = tpu_guard.run_guarded(
        [sys.executable, "-c", "print('{\"value\": 1}')"], cache_path=cache)
    elapsed = _time.time() - t0
    payload = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and payload["stale"] is True and payload["value"] == 11
    assert elapsed < 10, f"stale fallback took {elapsed:.1f}s"


def test_default_probe_budget_under_driver_timeout(monkeypatch):
    """The default probe budget must sit well under the driver's ~30-min
    SIGKILL (BENCH_r04.json rc=124 was a 2700-s budget outliving it)."""
    monkeypatch.delenv("BENCH_PROBE_BUDGET_S", raising=False)
    monkeypatch.delenv("BENCH_TOTAL_BUDGET_S", raising=False)
    seen = {}

    def spy(budget_s=None, **kw):
        seen["budget"] = budget_s
        return False

    monkeypatch.setattr(tpu_guard, "wait_for_backend", spy)
    tpu_guard.run_guarded([sys.executable, "-c", "pass"],
                          cache_path="/nonexistent/none.json")
    assert seen["budget"] <= 600


def test_sigterm_emits_stale_line(tmp_path):
    """Insurance: an external `timeout` SIGTERM mid-probe still yields a
    parseable stale line on stdout (rc 0), not rc=124 silence."""
    import signal as _signal
    import subprocess as _sp
    import time as _time

    cache = tmp_path / "last_good.json"
    cache.write_text(json.dumps({"metric": "m", "value": 13,
                                 "captured_at": "x"}))
    guard_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    script = (
        "import sys, time\n"
        f"sys.path.insert(0, {guard_dir!r})\n"
        "import tpu_guard\n"
        # interpreter startup can take seconds (sitecustomize); tell the
        # parent when the stubbed probe is actually about to block
        "def probe(timeout_s=90):\n"
        "    print('PROBE_ENTERED', flush=True); time.sleep(60); return False\n"
        "tpu_guard.probe_once = probe\n"
        f"rc = tpu_guard.run_guarded([sys.executable, '-c', 'pass'], "
        f"cache_path={str(cache)!r})\n"
        "sys.exit(rc)\n"
    )
    p = _sp.Popen([sys.executable, "-c", script], stdout=_sp.PIPE,
                  stderr=_sp.DEVNULL)
    assert p.stdout.readline().strip() == b"PROBE_ENTERED"
    _time.sleep(0.2)  # let it enter the sleep itself
    p.send_signal(_signal.SIGTERM)
    out, _ = p.communicate(timeout=15)
    payload = json.loads(out.decode().strip())
    assert p.returncode == 0
    assert payload["stale"] is True and payload["value"] == 13


def test_repo_last_good_cache_is_seeded():
    here = os.path.join(os.path.dirname(__file__), "..")
    payload = json.load(open(os.path.join(here, "BENCH_LAST_GOOD.json")))
    assert payload["metric"].startswith("hnswpq_flagship")
    assert payload["value"] > 0 and "captured_at" in payload
