"""Checkpoint/resume tests (SURVEY §5 property test: resume-after-kill ==
single-run output)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from light_curve_ray.pipelines.resume import run_rollup_resumable
from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup
from light_curve_ray.sources.pages import generate_pages_table

KEY = ["lang", "domain", "tier", "bucket_ts_us"]


class _Crash(Exception):
    pass


@pytest.fixture(scope="module")
def sharded_pages(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_sharded")
    for shard in range(4):
        tbl = generate_pages_table(n_rows=250, n_domains=10, seed=42 + shard)
        pq.write_table(tbl, str(d / f"pages-{shard:05d}.parquet"))
    return str(d)


def _cfg(pages_dir):
    return RollupConfig(input_paths=pages_dir, input_kind="pages",
                        tiers=("1h", "1d"), gorilla=False,
                        extract_concurrency=2)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEY).reset_index(drop=True)


def test_crash_then_resume_equals_single_run(ray_session, sharded_pages,
                                             tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # crash after the second committed shard
    seen = []

    def crash_after_two(pid):
        seen.append(pid)
        if len(seen) == 2:
            raise _Crash()

    with pytest.raises(_Crash):
        run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=1,
                             on_shard=crash_after_two)
    manifests = os.listdir(os.path.join(ckpt, "manifests"))
    assert len([m for m in manifests if m.endswith(".manifest.json")]) == 2

    # resume completes the remaining shards and matches a direct run
    res = run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=1)
    direct = run_rollup(_cfg(sharded_pages))
    got = _sorted(res["rollup"].to_pandas())
    exp = _sorted(direct["rollup"].to_pandas())
    assert len(got) == len(exp)
    for c in KEY + ["n", "filled"]:
        assert list(got[c]) == list(exp[c]), c
    for c in ["mean", "std", "beyond_1_std"]:
        g = got[c].to_numpy(np.float64)
        e = exp[c].to_numpy(np.float64)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) < 1e-9)
        assert bool(np.all(ok)), c


def test_resume_skips_done_shards(ray_session, sharded_pages, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    calls1 = []
    run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=2,
                         on_shard=calls1.append)
    assert len(calls1) == 2  # 4 fragments / shard_size 2
    calls2 = []
    run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=2,
                         on_shard=calls2.append)
    assert calls2 == []  # nothing re-extracted


def test_partials_checkpoint_tier(ray_session, sharded_pages, tmp_path,
                                  monkeypatch):
    """Rollup-stage checkpoint tier: once every shard committed its
    fine-partials table, the resumed tail must never rescan points into
    partials — and must match the direct run exactly."""
    import light_curve_ray.pipelines.rollup as rollup_mod

    ckpt = str(tmp_path / "ckpt3")
    run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=2)
    # the partials tier exists, one dir per shard, named by the fine tier
    proots = os.listdir(os.path.join(ckpt, "partials_1h"))
    assert len([p for p in proots if not p.endswith(".tmp")]) == 2

    def _must_not_scan(*a, **k):
        raise AssertionError("points->partials scan ran despite checkpoint")

    monkeypatch.setattr(rollup_mod, "make_partial_stats_fn", _must_not_scan)
    res = run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=2)
    monkeypatch.undo()
    direct = run_rollup(_cfg(sharded_pages))
    got = _sorted(res["rollup"].to_pandas())
    exp = _sorted(direct["rollup"].to_pandas())
    assert len(got) == len(exp)
    for c in KEY + ["n", "filled"]:
        assert list(got[c]) == list(exp[c]), c
    for c in ["mean", "std", "skew", "beyond_1_std", "stetson_k",
              "reduced_chi2"]:
        g = got[c].to_numpy(np.float64)
        e = exp[c].to_numpy(np.float64)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) < 1e-9)
        assert bool(np.all(ok)), c


def test_partials_missing_falls_back(ray_session, sharded_pages, tmp_path):
    """A checkpoint whose partials tier is incomplete (older run /
    partials=False) must still resume correctly from points alone."""
    import shutil as _shutil

    ckpt = str(tmp_path / "ckpt4")
    run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=2)
    proot = os.path.join(ckpt, "partials_1h")
    victim = sorted(os.listdir(proot))[0]
    _shutil.rmtree(os.path.join(proot, victim))
    res = run_rollup_resumable(_cfg(sharded_pages), ckpt, shard_size=2)
    direct = run_rollup(_cfg(sharded_pages))
    got = _sorted(res["rollup"].to_pandas())
    exp = _sorted(direct["rollup"].to_pandas())
    assert len(got) == len(exp)
    for c in ["n", "mean"]:
        g = got[c].to_numpy(np.float64)
        e = exp[c].to_numpy(np.float64)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) < 1e-9)
        assert bool(np.all(ok)), c
