"""Observability utilities."""

import json

from pcseg_tpu.utils.observe import MetricsLogger, StepTimer, profile_trace


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path)
    lg.log(0, {"loss": 1.5, "acc": 10.0})
    lg.log(1, {"loss": 1.2, "acc": 20.0})
    lg.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [0, 1]
    assert lines[1]["loss"] == 1.2 and "time" in lines[0]


def test_step_timer():
    t = StepTimer()
    assert t.ms is None
    t.tick()
    t.tick()
    assert t.ms is not None and t.ms >= 0


def test_profile_trace_noop_paths(tmp_path):
    # empty dir: no-op
    with profile_trace(""):
        pass
    # real dir: must not raise even if the backend lacks profiling
    with profile_trace(str(tmp_path / "trace")):
        pass
