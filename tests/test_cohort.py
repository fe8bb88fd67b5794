"""Cohort-retention path parity: the in-process sorted_group_map gate vs
the forced distributed sort (driver_limit_rows=0) must agree exactly —
the web-scale path is the same kernel behind the same exchange."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _canon(df):
    return df.sort_values(["cohort_week_us", "week_offset"]
                          ).reset_index(drop=True)


def test_cohort_retention_distributed_path_parity(ray_session):
    from light_curve_ray.pipelines.queries import _cohort_retention_ds

    gated = _canon(_cohort_retention_ds(SF).to_pandas())
    forced = _canon(_cohort_retention_ds(SF, driver_limit_rows=0).to_pandas())
    assert len(gated) > 0
    assert gated.equals(forced)
    # every user appears exactly once at offset 0 (their cohort week)
    assert (gated[gated["week_offset"] == 0]["n_users"].sum()
            == gated.groupby("cohort_week_us")["n_users"].max().sum())
