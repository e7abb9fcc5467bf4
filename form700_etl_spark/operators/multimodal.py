"""Multimodal-column plumbing (build plan M5 / north-star mandate).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` operators.  The real codec libraries (PIL, ffmpeg,
torchaudio) are NOT in this container, so the decode step is a
clearly-marked deterministic fake (sha256-derived pseudo-dimensions)
behind an import-try — the Spark-side plumbing (schemas, binary
handling, batch iteration, 1→N frame generation) is real and tested.

Scale notes: payload bytes travel executor-side only (never collected);
feature extraction is embarrassingly parallel over partitions; frame
sampling is a generator (1 row → N) inside the same Arrow batch, the
UDTF pattern for media expansion.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes:long, declared_type:string>"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sha_prefix string, "
    "fake_width int, fake_height int, decoder string"
)

FRAME_SCHEMA = "doc_id long, frame_index int, frame_ts_s double, frame_sha string"


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as a binary payload column + typed metadata
    — the multimodal table shape (payloads stay opaque bytes)."""
    d = table(spark, sf_dir, "documents")
    mtype = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            mtype.alias("declared_type"),
        ).alias("meta"),
    )


def _try_real_decoder():
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        return "pillow"
    except ImportError:
        return None


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per payload.  Uses a real decoder when
    available; otherwise the deterministic sha256 fake (dimensions are
    derived from the digest so results are stable and oracle-checkable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _try_real_decoder() or "fake-sha256"
        for pdf in batches:
            digests = [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha_prefix": [h[:16] for h in digests],
                    "fake_width": [64 + int(h[:2], 16) % 64 for h in digests],
                    "fake_height": [64 + int(h[2:4], 16) % 64 for h in digests],
                    "decoder": decoder,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, fps_every_s: float = 2.0) -> DataFrame:
    """1 video row → N frame rows (N = 1 + doc_id % 4): the media-UDTF
    pattern.  Frame 'decode' is stubbed as a digest of (payload, idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                n_frames = 1 + int(row["doc_id"]) % 4
                payload = bytes(row["payload"])
                for idx in range(n_frames):
                    rows.append(
                        (
                            int(row["doc_id"]),
                            idx,
                            idx * fps_every_s,
                            hashlib.sha256(payload + str(idx).encode()).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "frame_ts_s", "frame_sha"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def chunk_docs_udtf():
    """Spark 4 Python UDTF twin of ``queries.pipeline_ops.
    doc_chunk_windows`` — the 1->N table function API surface
    (SURVEY §2.8; the reference's per-row explode loop generalized).

    The builtin sequence/slice/explode plan is the hot path — this
    exists to prove the UDTF surface and is equivalence-tested against
    that plan in tests/test_functions.py.  Lateral-join usage::

        spark.udtf.register("chunk_docs", chunk_docs_udtf())
        spark.sql("SELECT c.* FROM documents, LATERAL chunk_docs(doc_id, text) c")
    """
    import hashlib

    from pyspark.sql.functions import udtf

    class ChunkDocs:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            n = len(toks)
            for idx, start in enumerate(range(0, n, 24)):
                chunk = toks[start:start + 32]
                yield (
                    doc_id,
                    idx,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return udtf(
        ChunkDocs,
        returnType="doc_id long, chunk_idx int, chunk_tokens int, chunk_md5 string",
    )


RESIZE_SCHEMA = (
    "doc_id long, media_type string, in_width int, in_height int, "
    "out_width int, out_height int, resized_sha string"
)


def resize_media(media: DataFrame, target_w: int = 96, target_h: int = 64) -> DataFrame:
    """Aspect-preserving fit of every image payload into (target_w,
    target_h).  The decode is the same deterministic sha256 fake as
    extract_features; the FIT ARITHMETIC is the real operator — pure
    integers (cross-multiplication comparison + integer division), so
    both engines agree exactly — and the 'resized payload' is a digest
    of (payload, out dims), standing in for re-encoded bytes with the
    batch shape and binary handling fully real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "image":
                    continue
                payload = bytes(row["payload"])
                h = hashlib.sha256(payload).hexdigest()
                in_w = 64 + int(h[:2], 16) % 64
                in_h = 64 + int(h[2:4], 16) % 64
                if in_w * target_h >= in_h * target_w:  # width-bound
                    out_w = target_w
                    out_h = in_h * target_w // in_w
                else:
                    out_h = target_h
                    out_w = in_w * target_h // in_h
                rows.append(
                    (
                        int(row["doc_id"]),
                        row["media_type"],
                        in_w,
                        in_h,
                        out_w,
                        out_h,
                        hashlib.sha256(
                            payload + f"{out_w}x{out_h}".encode()
                        ).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "in_width",
                    "in_height",
                    "out_width",
                    "out_height",
                    "resized_sha",
                ],
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features` — identical
    semantics, different batch transport.  For BINARY payload columns
    the Arrow path matters: ``mapInPandas`` materializes every payload
    as a Python ``bytes`` object in an object-dtype Series (one heap
    allocation + refcount per cell), while ``pyarrow.RecordBatch``
    hands the payload buffer over zero-copy and only the per-row
    ``as_py()`` touch pays Python cost.  Same shuffle story (none);
    the choice is purely about batch-boundary overhead, which at
    100 TB of media is the hot constant factor.  Equivalence with the
    pandas path is test-enforced."""
    import pyarrow as pa

    def run(batches):
        decoder = _try_real_decoder() or "fake-sha256"
        for batch in batches:
            doc_ids = batch.column("doc_id")
            mtypes = batch.column("media_type")
            payloads = batch.column("payload")
            n = batch.num_rows
            n_bytes, sha_prefix, widths, heights = [], [], [], []
            for i in range(n):
                buf = payloads[i].as_py()
                h = hashlib.sha256(buf).hexdigest()
                n_bytes.append(len(buf))
                sha_prefix.append(h[:16])
                widths.append(64 + int(h[:2], 16) % 64)
                heights.append(64 + int(h[2:4], 16) % 64)
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    mtypes,
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(sha_prefix, type=pa.string()),
                    pa.array(widths, type=pa.int32()),
                    pa.array(heights, type=pa.int32()),
                    pa.array([decoder] * n, type=pa.string()),
                ],
                names=[
                    "doc_id", "media_type", "n_bytes", "sha_prefix",
                    "fake_width", "fake_height", "decoder",
                ],
            )

    return media.mapInArrow(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------------ real audio path

# Unlike image/video (codec libs absent -> documented sha256 fake), PCM
# WAV needs only the stdlib `wave` module — so the audio path is a REAL
# container decode: synthesized RIFF/WAVE payloads round-trip through an
# actual parser, and the features below (rate, channels, duration, RMS,
# peak) come from the decoded samples, not a digest.

WAV_SAMPLE_RATE = 8000
WAV_N_SAMPLES = 400  # 50 ms per clip

AUDIO_SCHEMA = "doc_id long, payload binary"
AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples int, "
    "duration_ms int, rms_e3 long, peak int, decoder string"
)


def synth_wav_bytes(doc_id: int) -> bytes:
    """Deterministic mono PCM16 WAV: a pure sine whose frequency and
    amplitude derive from doc_id.  Executor-side; also used by the law
    test to recompute expectations locally."""
    import io
    import math
    import struct
    import wave

    freq = 100 + (doc_id % 20) * 25
    amp = 8000 + (doc_id % 7) * 1000
    samples = [
        int(amp * math.sin(2 * math.pi * freq * t / WAV_SAMPLE_RATE))
        for t in range(WAV_N_SAMPLES)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(struct.pack(f"<{WAV_N_SAMPLES}h", *samples))
    return buf.getvalue()


def synthesize_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One WAV payload per document — the audio-table shape."""
    d = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [synth_wav_bytes(int(i)) for i in pdf["doc_id"]],
                }
            )

    return d.mapInPandas(gen, schema=AUDIO_SCHEMA)


def decode_audio_features(audio: DataFrame) -> DataFrame:
    """REAL decode: parse each RIFF/WAVE container with stdlib ``wave``,
    unpack the PCM16 frames, and compute sample-domain features.  The
    squared-sample sum is exact integer arithmetic; only the final RMS
    sqrt is float (quantized to e3 for stability)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import struct
        import wave

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    sr = w.getframerate()
                    nc = w.getnchannels()
                    n = w.getnframes()
                    raw = w.readframes(n)
                s = struct.unpack(f"<{n * nc}h", raw)
                sq = sum(x * x for x in s)  # exact int
                rows.append(
                    (
                        int(doc_id),
                        sr,
                        nc,
                        n,
                        round(1000 * n / sr),
                        round(1000 * math.sqrt(sq / len(s))),
                        max(abs(min(s)), abs(max(s))),
                        "stdlib-wave",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "rms_e3",
                    "peak",
                    "decoder",
                ],
            )

    return audio.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
