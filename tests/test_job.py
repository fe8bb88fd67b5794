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
