"""Driver-contract tests for bench.py's crash guards — the r03 driver
bench died rc=1 with nothing parsed, so the resumable query runner must
salvage completed timings, retry the interrupted query once, and skip
it after two deaths.  Subprocesses are faked; no Ray involved."""

from __future__ import annotations

import json
import sys
import types


def _load_bench(monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_build_queries(names):
    fake = types.ModuleType("light_curve_ray.pipelines.queries")
    fake.build_queries = lambda: {n: (lambda sf: None) for n in names}
    return fake


def test_resumable_salvages_and_retries(monkeypatch):
    bench = _load_bench(monkeypatch)
    names = ["q1", "q2", "q3", "q4"]
    monkeypatch.setitem(sys.modules, "light_curve_ray.pipelines.queries",
                        _fake_build_queries(names))
    calls = []

    def fake_run(cmd, capture_output, text, timeout, env):
        prog = env["LCR_QPROGRESS"]
        i = cmd.index("--queries-once")
        asked = cmd[i + 1].split(",")
        calls.append(list(asked))
        with open(prog, "w") as f:
            if len(calls) == 1:
                # first session: q1 done, then a raylet death mid-q2
                f.write(json.dumps({"q1": 1.0}) + "\n")
                return types.SimpleNamespace(returncode=1, stdout="",
                                             stderr="raylet died")
            # retry session: finishes everything it was asked
            for n in asked:
                f.write(json.dumps({n: 0.5}) + "\n")
        return types.SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._run_queries_resumable()
    assert calls[0] == ["q1", "q2", "q3", "q4"]
    assert calls[1] == ["q2", "q3", "q4"]  # resumes at the crashed query
    assert out == {"q1": 1.0, "q2": 0.5, "q3": 0.5, "q4": 0.5}


def test_resumable_skips_twice_dead_query(monkeypatch) -> None:
    bench = _load_bench(monkeypatch)
    names = ["a", "b"]
    monkeypatch.setitem(sys.modules, "light_curve_ray.pipelines.queries",
                        _fake_build_queries(names))
    n_calls = [0]

    def fake_run(cmd, capture_output, text, timeout, env):
        n_calls[0] += 1
        prog = env["LCR_QPROGRESS"]
        i = cmd.index("--queries-once")
        asked = cmd[i + 1].split(",")
        with open(prog, "w") as f:
            if asked[0] == "a":  # query 'a' always dies
                return types.SimpleNamespace(returncode=1, stdout="",
                                             stderr="")
            for n in asked:
                f.write(json.dumps({n: 0.5}) + "\n")
        return types.SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._run_queries_resumable()
    assert out["failed"] == ["a"]
    assert out["b"] == 0.5
    assert n_calls[0] == 3  # a, retry a, then the rest


def test_resumable_salvages_on_timeout(monkeypatch):
    bench = _load_bench(monkeypatch)
    import subprocess as sp
    names = ["q1", "q2", "q3"]
    monkeypatch.setitem(sys.modules, "light_curve_ray.pipelines.queries",
                        _fake_build_queries(names))

    def fake_run(cmd, capture_output, text, timeout, env):
        with open(env["LCR_QPROGRESS"], "w") as f:
            f.write(json.dumps({"q1": 1.0}) + "\n")
            f.write('{"q2": 0.')  # truncated line from a mid-append kill
        raise sp.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench._run_queries_resumable()
    # completed timing salvaged, truncated line skipped, rest failed
    assert out["q1"] == 1.0
    assert out["failed"] == ["q2", "q3"]
