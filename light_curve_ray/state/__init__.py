"""Checkpoint / lineage manifests for mid-rollup resume."""

from .manifest import Manifest, partition_done, write_manifest

__all__ = ["Manifest", "partition_done", "write_manifest"]
