"""wait_for_backend: bounded accelerator-health probing (bench.py /
__graft_entry__ ride out transient TPU-tunnel outages instead of
recording a dead driver round)."""

import subprocess

import pcseg_tpu.core.runtime as rt


class _R:
    def __init__(self, rc):
        self.returncode = rc


def test_cpu_forced_short_circuits(monkeypatch):
    # the test env forces jax_platforms=cpu (conftest) — no probing
    calls = []
    monkeypatch.setattr(
        rt.subprocess, "run", lambda *a, **k: calls.append(a) or _R(1)
    )
    assert rt.wait_for_backend(max_wait_s=5.0) is True
    assert not calls


def test_wait_returns_true_on_healthy_probe(monkeypatch):
    monkeypatch.setattr(rt, "_cpu_forced", lambda: False)
    calls = []
    monkeypatch.setattr(
        rt.subprocess, "run", lambda *a, **k: calls.append(a) or _R(0)
    )
    assert rt.wait_for_backend(max_wait_s=5.0) is True
    assert len(calls) == 1  # no-op cost when healthy: one probe


def test_wait_bounded_on_dead_backend(monkeypatch):
    attempts = []

    def dead(*a, **k):
        attempts.append(1)
        if len(attempts) == 2:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
        return _R(1)

    monkeypatch.setattr(rt, "_cpu_forced", lambda: False)
    monkeypatch.setattr(rt.subprocess, "run", dead)
    monkeypatch.setattr(rt.time, "sleep", lambda s: None)
    t = iter(range(100))
    monkeypatch.setattr(rt.time, "monotonic", lambda: float(next(t)))
    assert rt.wait_for_backend(max_wait_s=3.0) is False
    assert 2 <= len(attempts) <= 5  # kept probing until the deadline
