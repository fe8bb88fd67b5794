"""light_curve_ray — a Ray-Data-native time-series rollup / downsample / retention engine.

From-scratch distributed engine with the kernel vocabulary of the reference
``light-curve/light-curve`` repo (co-sort, uniform grids, linear gap-fill,
absolute-tolerance comparison; see /root/reference) re-expressed Ray-Data-first:

- ``kernels``   — pure NumPy/Python kernels, no Ray imports.  Shared by the
                  distributed pipeline, the single-process oracle and the tests.
- ``sources``   — deterministic synthetic ``pages`` generator + parquet IO.
- ``stages``    — ``map_batches`` / ``map_groups`` stage implementations.
- ``pipelines`` — end-to-end rollup pipeline + driver-facing queries.
- ``state``     — checkpoint manifests / lineage for mid-rollup resume.

The web-scale text / dedup / similarity operators live in ``stages``
(dedup, similarity, textstats, multimodal) over kernels in ``kernels``
(hashing, textkit).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
