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


def test_repo_last_good_cache_is_seeded():
    here = os.path.join(os.path.dirname(__file__), "..")
    payload = json.load(open(os.path.join(here, "BENCH_LAST_GOOD.json")))
    assert payload["metric"].startswith("hnswpq_flagship")
    assert payload["value"] > 0 and "captured_at" in payload
