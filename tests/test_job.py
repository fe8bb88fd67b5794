"""`python -m light_curve_ray.job` — the ray-job-submit entry surface.

Runs the module as a REAL subprocess (its own Ray session, like a
submitted job); asserts the one-line JSON stdout contract and that
resubmitting with --checkpoint reuses committed shards."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(extra, tmp_path):
    cmd = [sys.executable, "-m", "light_curve_ray.job",
           "--input", f"{SF}/events.parquet", "--input-kind", "table",
           "--key-cols", "event_type", "--ts-col", "ts",
           "--value-col", "value", "--num-cpus", "4"] + extra
    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run(cmd, env=env, cwd=str(tmp_path), timeout=600,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])

def test_job_writes_partitioned_output(tmp_path):
    res = _run(["--out", str(tmp_path / "out"), "--tiers", "1d"], tmp_path)
    assert res["rollup_rows"] > 0
    assert os.path.isdir(res["out"]["rollup"])
    assert os.path.exists(str(tmp_path / "out" / "metrics.json"))


def test_job_checkpoint_resubmit_same_result(tmp_path):
    ck = str(tmp_path / "ckpt")
    r1 = _run(["--checkpoint", ck, "--tiers", "1h,1d"], tmp_path)
    r2 = _run(["--checkpoint", ck, "--tiers", "1h,1d"], tmp_path)
    assert r1["rollup_rows"] == r2["rollup_rows"] > 0
    assert r1["series_rows"] == r2["series_rows"] > 0


def test_job_query_mode(ray_session, tmp_path):
    """--query runs a registered analytics query and writes parquet."""
    import json
    import subprocess
    import sys

    out = tmp_path / "q.parquet"
    proc = subprocess.run(
        [sys.executable, "-m", "light_curve_ray.job",
         "--query", "events_by_type", "--sf-dir", SF,
         "--out-parquet", str(out), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["query"] == "events_by_type" and line["rows"] > 0
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == line["rows"]


def test_job_query_mode_unknown_name():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "light_curve_ray.job",
         "--query", "nope", "--sf-dir", SF],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode != 0
    assert "unknown query" in proc.stderr


def test_job_compact_mode(tmp_path):
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    rng = np.random.default_rng(4)
    total = 0
    for i in range(6):
        n = int(rng.integers(10, 40))
        total += n
        pq.write_table(pa.table({"x": pa.array(rng.integers(0, 99, n))}),
                       src / f"p{i}.parquet")
    proc = subprocess.run(
        [sys.executable, "-m", "light_curve_ray.job",
         "--compact", str(src), "--out", str(out),
         "--target-mb", "1", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["mode"] == "compact" and line["rows_written"] == total
    assert line["n_out"] < line["n_in"]
    assert pq.read_table(str(out)).num_rows == total
