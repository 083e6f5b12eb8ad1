"""Lake maintenance: small-file compaction.

Streaming sinks and fine-grained partition overwrites accumulate small
parquet files; scan cost at 100 TB is dominated by file-open overhead
once files drop below ~tens of MB. Compaction rewrites a directory to
~target-size files. The rewrite is atomic-by-rename: new files land in
a sibling temp dir, then the swap is two renames — readers never see a
half-written directory.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "part-*.parquet"))) or sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )


def plan_target_files(total_bytes: int, target_bytes: int) -> int:
    """ceil(total/target), at least 1 — same shape as the reference's
    page-count math (`cmd/root.go:373-375`) applied to bytes."""
    return max(1, -(-total_bytes // target_bytes))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Compact `path` (a flat parquet dir) to ~target_bytes files.
    Returns a report dict; no-op when already compact. Uses coalesce
    (narrow — no shuffle) since output order is irrelevant for a bag of
    rows; a sorted/clustered layout would use repartitionByRange
    upstream instead."""
    files = parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_target = plan_target_files(total, target_bytes)
    if len(files) <= max(n_target, min_files - 1):
        return {
            "path": path,
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total,
            "compacted": False,
        }

    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df = spark.read.parquet(path)
    df.coalesce(n_target).write.parquet(tmp)
    # atomic-by-rename swap
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "path": path,
        "files_before": len(files),
        "files_after": len(parquet_files(path)),
        "bytes": total,
        "compacted": True,
    }
