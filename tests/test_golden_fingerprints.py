"""Pinned golden fingerprints for deterministic rows-only queries.

These three queries have no SQL oracle (zlib DEFLATE, tall-skinny PCA,
and DCT perceptual hashing aren't expressible in DuckDB), so the driver
records only a rows-only check — "runs" rather than "right".  Each is
fully deterministic (verified identical across sessions AND across
shuffle-partition counts), so an order-insensitive content hash pinned
per SF upgrades them to "can't silently drift": any change to the
decode, the math, or the flag thresholds breaks the hash.

Regenerate after an INTENTIONAL semantic change with the inline
``_fingerprint`` helper (sorted columns, repr-rendered floats, sorted
rows, sha256/16).
"""

from __future__ import annotations

import hashlib

import pytest

GOLDEN = {
    "/root/testdata/sf0.001": {
        "text_zlib_compression_quality": "9d944a8090219f0d",
        "embedding_pca_project": "3ed033eceb1709d0",
        "multimodal_image_phash_neardup": "b10263eef2f89d23",
    },
    "/root/testdata/sf0.01": {
        "text_zlib_compression_quality": "5ece7378c10bbe47",
        "embedding_pca_project": "ba1aa01ff7463c7a",
        # synthesized dedup-image corpus is SF-invariant by design, so
        # the hash matches sf0.001 — that equality is itself a law
        "multimodal_image_phash_neardup": "b10263eef2f89d23",
    },
}


def _fingerprint(df) -> str:
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()

    def render(v):
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, list):
            return "[" + ",".join(render(x) for x in v) + "]"
        return str(v)

    lines = sorted("|".join(render(r[c]) for c in cols) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


@pytest.mark.parametrize(
    "name",
    [
        "text_zlib_compression_quality",
        "embedding_pca_project",
        "multimodal_image_phash_neardup",
    ],
)
def test_rows_only_query_matches_golden_fingerprint(spark, sf_dir, name):
    from form700_etl_spark.registry import all_queries

    golden = GOLDEN.get(sf_dir, {}).get(name)
    if golden is None:
        pytest.skip(f"no golden pinned for {sf_dir}")
    got = _fingerprint(all_queries()[name].fn(spark, sf_dir))
    assert got == golden, (
        f"{name} drifted at {sf_dir}: {got} != pinned {golden} — if the "
        "change was intentional, regenerate the GOLDEN entry"
    )
