"""Small-file compaction for parquet table directories.

Streaming sinks, frequent micro-batch appends, and over-parallel
writes all leave a table as thousands of KB-sized files; at 100 TB the
resulting per-file open/footer costs dominate scans and the NameNode /
object-store listing becomes its own bottleneck.  Compaction rewrites
the table as ceil(total_bytes / target_bytes) files — the OPTIMIZE
primitive of the lakehouse formats, for plain parquet directories.

Scale design:

- **No shuffle unless re-clustering is requested.**  Plain compaction
  uses ``coalesce`` — a narrow dependency that concatenates input
  splits into fewer tasks without an exchange.  With ``sort_by``, the
  rewrite range-partitions + sorts instead (one shuffle), combining
  compaction with re-clustering (pair with operators/zorder.py for
  Morton keys) since the data is being rewritten anyway.
- **Idempotent swap.**  The rewrite lands in a sibling temp dir, is
  row-count-verified against the source, and is swapped in with two
  renames (old -> .bak, tmp -> path).  A crash before the first rename
  leaves the table untouched; between renames the .bak still holds the
  data.  On object stores the swap step would become a manifest commit
  — the verify-then-publish structure is the portable part.
- **Planning is metadata-only**: file count and byte sizes come from a
  directory listing, no data read, so the "already compact" fast path
  costs one listing.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass(frozen=True)
class CompactionReport:
    path: str
    files_before: int
    files_after: int
    bytes_total: int
    rows: int
    compacted: bool


def _data_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: list[str] | None = None,
    min_files_to_compact: int = 2,
) -> CompactionReport:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files.  Returns a report; a
    no-op (already compact) returns ``compacted=False``."""
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, -(-total // target_bytes))
    if len(files) < min_files_to_compact or len(files) <= n_target:
        return CompactionReport(path, len(files), len(files), total, -1, False)

    src = spark.read.parquet(path)
    rows_before = src.count()
    tmp = path.rstrip("/") + ".compact-tmp"
    bak = path.rstrip("/") + ".compact-bak"
    if sort_by:
        out = src.repartitionByRange(n_target, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = src.coalesce(n_target)
    out.write.mode("overwrite").parquet(tmp)

    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before:  # verify BEFORE publish
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch at {path}: {rows_before} -> {rows_after}"
        )
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return CompactionReport(
        path, len(files), len(_data_files(path)), total, rows_after, True
    )
