"""The bench/entry device-health gate: bounded retry, then honest failure.

The tunnel backend (one v5e behind an HTTP relay) can go down for minutes;
`bench._require_live_device` retries SUBPROCESS probes inside
$SLAMKIT_BENCH_WAIT_S before declaring the backend dead (a wedged in-process
jax init can never recover, so the gate must not touch this process's jax
until a fresh interpreter answers).
"""
import time

import pytest

import bench


def test_retry_until_backend_answers(monkeypatch):
    calls = []

    def fake_probe(timeout):
        calls.append(timeout)
        return len(calls) >= 3  # down, down, up

    monkeypatch.setattr(bench, "_backend_answers", fake_probe)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.setenv("SLAMKIT_BENCH_WAIT_S", "9999")
    # fatal=False: returns None on success (in-process probe runs on the
    # CPU-forced test backend and answers immediately)
    assert bench._require_live_device(fatal=False) is None
    assert len(calls) == 3


def test_zero_budget_fails_without_retry(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "_backend_answers",
                        lambda timeout: calls.append(timeout) or False)
    monkeypatch.setenv("SLAMKIT_BENCH_WAIT_S", "0")
    with pytest.raises(RuntimeError, match="unreachable"):
        bench._require_live_device(fatal=False)
    assert len(calls) == 1  # single probe, no retry loop


def test_budget_is_bounded(monkeypatch):
    """Probes that never answer stop at the deadline, not forever."""
    clock = {"t": 0.0}
    monkeypatch.setattr(time, "monotonic", lambda: clock["t"])

    def advance(s):
        clock["t"] += s

    monkeypatch.setattr(time, "sleep", advance)

    calls = []

    def fake_probe(timeout):
        calls.append(timeout)
        clock["t"] += 60  # each probe burns a minute
        return False

    monkeypatch.setattr(bench, "_backend_answers", fake_probe)
    monkeypatch.setenv("SLAMKIT_BENCH_WAIT_S", "300")
    with pytest.raises(RuntimeError, match="unreachable"):
        bench._require_live_device(fatal=False)
    assert 2 <= len(calls) <= 7
