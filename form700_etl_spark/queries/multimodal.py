"""Multimodal-column queries (build plan M5).

The Spark side runs real binary-column plumbing through Arrow-batched
``mapInPandas`` (operators/multimodal.py); the decode is a
deterministic sha256 fake (codec libs absent here), which makes even
these Python-operator pipelines DuckDB-oracle-checkable: the oracle
recomputes the same digests in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, sample_frames, synthesize_media
from ..registry import register

# hex-digit -> int in portable SQL (DuckDB has no hex-parse for VARCHAR)
def _hexval(expr: str) -> str:
    return f"(strpos('0123456789abcdef', {expr}) - 1)"


_B0 = f"({_hexval('substr(sha256(text), 1, 1)')} * 16 + {_hexval('substr(sha256(text), 2, 1)')})"
_B1 = f"({_hexval('substr(sha256(text), 3, 1)')} * 16 + {_hexval('substr(sha256(text), 4, 1)')})"


@register(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS sha_prefix,
           CAST(64 + {_B0} % 64 AS INT) AS fake_width,
           CAST(64 + {_B1} % 64 AS INT) AS fake_height,
           'fake-sha256' AS decoder
    FROM documents
    """,
    tags=("multimodal",),
    doc=(
        "binary payload -> mapInPandas feature extraction (decode stubbed as "
        "deterministic sha256 dims); oracle recomputes the digests in SQL."
    ),
)
def multimodal_feature_extract(spark, sf_dir):
    return extract_features(synthesize_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(1 + doc_id % 4)) AS INT) AS frame_index,
           CAST(unnest(range(1 + doc_id % 4)) AS DOUBLE) * 2.0 AS frame_ts_s
    FROM documents
    WHERE doc_id % 3 = 2
    """,
    tags=("multimodal",),
    doc="video row -> N frame rows via mapInPandas generator (media UDTF pattern).",
)
def multimodal_frame_sample(spark, sf_dir):
    frames = sample_frames(synthesize_media(spark, sf_dir))
    # frame_sha is python-hashlib-only (no blob sha in the oracle) — project
    # the SQL-checkable columns; the digest column is covered by tests
    return frames.select("doc_id", "frame_index", F.col("frame_ts_s"))
