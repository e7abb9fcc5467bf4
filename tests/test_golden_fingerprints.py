"""Pinned golden fingerprints for ALL deterministic rows-only queries.

The 14 registered queries without a SQL oracle (zlib DEFLATE, PCA, the
codec-true multimodal decodes, the ANN family's numpy reranks, the
HLL/quantile sketches) get only the driver's rows-only check — "runs"
rather than "right".  Each is fully deterministic (verified identical
across sessions AND across shuffle-partition counts 32 vs 7 — the ANN
per-batch partial top-k unions always contain the global top-k, so the
final window is partitioning-invariant), so an order-insensitive
content hash pinned per SF upgrades every one to "can't silently
drift": any change to a decode, the math, or a threshold breaks the
hash.

Regenerate after an INTENTIONAL semantic change with the inline
``_fingerprint`` helper (sorted columns, repr-rendered floats,
sha256-rendered binary, sorted rows, sha256/16).
"""

from __future__ import annotations

import hashlib

import pytest

GOLDEN = {
    "/root/testdata/sf0.001": {
        "text_zlib_compression_quality": "9d944a8090219f0d",
        "embedding_pca_project": "3ed033eceb1709d0",
        "multimodal_image_phash_neardup": "b10263eef2f89d23",
        # every remaining rows-only query, each verified stable across
        # sessions AND across shuffle-partition counts (32 vs 7) before
        # pinning — the ANN partial-top-k unions and the HLL/quantile
        # sketch merges are partitioning-invariant by construction
        "ann_cosine_topk_matmul": "8f714f56d0a994b5",
        "ann_ivf_topk": "490c0760d2dd8701",
        "ann_pq_topk": "935068a1aba85c8a",
        "approx_distinct_and_quantiles": "3b009c671deb6d8b",
        "dedup_cdc_chunks": "31667fd17e440382",
        "multimodal_audio_decode": "f1ae379ca6543cb3",
        "multimodal_audio_fp_neardup": "cf84fb975362f1f5",
        "multimodal_image_decode": "961a5f6a0132c372",
        "multimodal_image_dhash_neardup": "72f13b0773f3ebdc",
        "multimodal_video_frames_real": "6174ac45cdfa248e",
        "sketch_hll_rollup": "d8725ba67d615837",
    },
    "/root/testdata/sf0.01": {
        "text_zlib_compression_quality": "5ece7378c10bbe47",
        "embedding_pca_project": "ba1aa01ff7463c7a",
        # the synthesized multimodal corpora are SF-invariant by design,
        # so their hashes match sf0.001 — that equality is itself a law
        "multimodal_image_phash_neardup": "b10263eef2f89d23",
        "ann_cosine_topk_matmul": "d3df591b9a11ef77",
        "ann_ivf_topk": "d9fb4426ef6161cb",
        "ann_pq_topk": "629669f5b4086a2c",
        "approx_distinct_and_quantiles": "4680e535d2d7eaa7",
        "dedup_cdc_chunks": "7a96d9f82f8d26b1",
        "multimodal_audio_decode": "f1ae379ca6543cb3",
        "multimodal_audio_fp_neardup": "cf84fb975362f1f5",
        "multimodal_image_decode": "961a5f6a0132c372",
        "multimodal_image_dhash_neardup": "72f13b0773f3ebdc",
        "multimodal_video_frames_real": "6174ac45cdfa248e",
        "sketch_hll_rollup": "fced22911d8bb183",
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
        if isinstance(v, (bytes, bytearray)):
            return hashlib.sha256(bytes(v)).hexdigest()[:12]
        return str(v)

    lines = sorted("|".join(render(r[c]) for c in cols) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


@pytest.mark.parametrize(
    "name",
    sorted(GOLDEN["/root/testdata/sf0.001"]),
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
