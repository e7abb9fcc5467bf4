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


# ----------------------------------------------------- real image path

# Same move as WAV: 24-bit BMP is a fixed-layout container a pure-
# Python struct parse handles — so the image path also gets a REAL
# decode (header-declared dims + exact integer channel sums), keeping
# the sha256 fake only for formats that genuinely need absent codecs.

BMP_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, bpp int, n_pixels int, "
    "mean_r_e3 long, mean_g_e3 long, mean_b_e3 long, decoder string"
)


def synth_bmp_bytes(doc_id: int) -> bytes:
    """Deterministic 24-bit bottom-up BMP; dims and pixels derive from
    doc_id.  Also used by the law test for local recomputation."""
    import struct

    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    row_pad = (-(w * 3)) % 4
    rows = []
    for y in range(h):  # bottom-up per the format
        row = bytearray()
        for x in range(w):
            b = (doc_id * 11 + x * 3 + y * 7) % 256
            g = (doc_id * 5 + x * 13 + y * 2) % 256
            r = (doc_id * 3 + x * 7 + y * 11) % 256
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    off = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_data


def synthesize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [synth_bmp_bytes(int(i)) for i in pdf["doc_id"]],
                }
            )

    return d.mapInPandas(gen, schema=AUDIO_SCHEMA)  # same (doc_id, payload) shape


def decode_bmp_features(images: DataFrame) -> DataFrame:
    """REAL decode: parse the BITMAPFILE/INFO headers, walk the padded
    bottom-up pixel rows, and produce header dims + exact integer
    channel sums (e3-quantized means)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                magic, _, _, _, off = struct.unpack_from("<2sIHHI", buf, 0)
                assert magic == b"BM", "not a BMP payload"
                hsz, w, h, _, bpp = struct.unpack_from("<IiiHH", buf, 14)
                row_stride = (w * 3 + 3) & ~3
                sr = sg = sb = 0
                for y in range(h):
                    base = off + y * row_stride
                    for x in range(w):
                        i = base + x * 3
                        sb += buf[i]
                        sg += buf[i + 1]
                        sr += buf[i + 2]
                n = w * h
                rows.append(
                    (
                        int(doc_id), w, h, bpp, n,
                        round(1000 * sr / n), round(1000 * sg / n),
                        round(1000 * sb / n), "stdlib-struct-bmp",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bpp", "n_pixels",
                    "mean_r_e3", "mean_g_e3", "mean_b_e3", "decoder",
                ],
            )

    return images.mapInPandas(run, schema=BMP_FEATURE_SCHEMA)


# ----------------------------------------------------- real video path

# YUV4MPEG2 (y4m) is the plain-header raw-frame interchange format the
# ffmpeg/mplayer toolchain uses; header + FRAME markers parse with
# pure Python, so frame SAMPLING becomes real too: parse the stream
# header, seek frame payloads, and emit one feature row per sampled
# frame (1 -> N, the media-UDTF pattern over an actual container).

Y4M_FRAME_SCHEMA = (
    "doc_id long, frame_index int, width int, height int, "
    "mean_y_e3 long, decoder string"
)


def synth_y4m_bytes(doc_id: int) -> bytes:
    """Deterministic C444 y4m clip: 1 + doc_id % 4 frames of 8x6 YUV."""
    w, h = 8, 6
    n_frames = 1 + doc_id % 4
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        y_plane = bytes(
            (doc_id * 13 + f * 29 + i) % 256 for i in range(w * h)
        )
        u_plane = bytes((doc_id * 7 + f * 3 + i) % 256 for i in range(w * h))
        v_plane = bytes((doc_id * 17 + f * 5 + i) % 256 for i in range(w * h))
        out += [y_plane, u_plane, v_plane]
    return b"".join(out)


def synthesize_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [synth_y4m_bytes(int(i)) for i in pdf["doc_id"]],
                }
            )

    return d.mapInPandas(gen, schema=AUDIO_SCHEMA)


def decode_y4m_frames(videos: DataFrame) -> DataFrame:
    """REAL frame sampling: parse the YUV4MPEG2 stream header (W/H/C
    tokens), walk FRAME markers, and emit per-frame luma means from
    exact integer sums — one output row per frame of each clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                nl = buf.index(b"\n")
                tokens = buf[:nl].decode().split(" ")
                assert tokens[0] == "YUV4MPEG2", "not a y4m payload"
                w = int(next(t[1:] for t in tokens if t.startswith("W")))
                h = int(next(t[1:] for t in tokens if t.startswith("H")))
                c = next((t[1:] for t in tokens if t.startswith("C")), "420")
                plane = w * h
                frame_bytes = plane * 3 if c == "444" else plane * 3 // 2
                pos, idx = nl + 1, 0
                while pos < len(buf):
                    fnl = buf.index(b"\n", pos)
                    assert buf[pos:fnl].startswith(b"FRAME")
                    y_plane = buf[fnl + 1 : fnl + 1 + plane]
                    rows.append(
                        (
                            int(doc_id), idx, w, h,
                            round(1000 * sum(y_plane) / plane),
                            "stdlib-y4m",
                        )
                    )
                    pos = fnl + 1 + frame_bytes
                    idx += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_index", "width", "height",
                    "mean_y_e3", "decoder",
                ],
            )

    return videos.mapInPandas(run, schema=Y4M_FRAME_SCHEMA)


# ----------------------------------------------- image dHash near-dup

# The gradient-pattern BMPs above are too regular for perceptual
# hashing (linear mod-256 gradients make unrelated dHashes collide),
# so the dedup corpus uses hash-seeded pseudo-random pixels: every
# content key yields an i.i.d.-looking image, and the perturbed twin
# (+2 on every 37th byte) moves the 64-bit dHash by <= 1 bit while
# unrelated keys sit >= 22 bits apart (measured; median 32 = the
# binomial(64, 1/2) bulk).

DHASH_IMG_W = 16
DHASH_IMG_H = 12
DHASH_GROUP = 3  # doc_id // 3 -> every 3 consecutive docs share an image
DHASH_PERTURB_EVERY = 13  # every 13th doc gets the near-dup variant


def synth_noise_bmp_bytes(key: int) -> bytes:
    """Deterministic 24-bit BMP with sha256-seeded pseudo-random pixels."""
    import hashlib
    import struct

    w, h = DHASH_IMG_W, DHASH_IMG_H
    row_pad = (-(w * 3)) % 4
    stream = b""
    i = 0
    while len(stream) < w * h * 3:
        stream += hashlib.sha256(f"img:{key}:{i}".encode()).digest()
        i += 1
    px = iter(stream)
    rows = []
    for _ in range(h):
        row = bytearray()
        for _ in range(w):
            row += bytes((next(px), next(px), next(px)))
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    data = b"".join(rows)
    off = 54
    fh = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return fh + ih + data


def perturb_bmp_bytes(buf: bytes, step: int = 37, delta: int = 2) -> bytes:
    """Mild deterministic pixel noise (the near-duplicate generator)."""
    out = bytearray(buf)
    for i in range(54, len(out), step):
        out[i] = min(255, out[i] + delta)
    return bytes(out)


def bmp_dhash64(buf: bytes) -> int:
    """64-bit difference hash (dHash, Krawetz 2013): grayscale, sample
    a 9x8 grid, emit one bit per horizontal gradient sign.  Returned as
    a SIGNED 64-bit int (two's complement) so it lands in a Spark
    LongType column unchanged."""
    import struct

    off = struct.unpack_from("<2sIHHI", buf, 0)[4]
    _, w, h, _, _ = struct.unpack_from("<IiiHH", buf, 14)
    stride = (w * 3 + 3) & ~3

    def gray(x: int, y: int) -> int:
        i = off + y * stride + x * 3
        return (buf[i] + buf[i + 1] + buf[i + 2]) // 3

    bits = 0
    for yy in range(8):
        yi = yy * (h - 1) // 7
        row = [gray(xx * (w - 1) // 8, yi) for xx in range(9)]
        for xx in range(8):
            bits = (bits << 1) | (1 if row[xx] < row[xx + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def synthesize_dedup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image corpus with INJECTED duplicate structure: content key =
    doc_id // 3 (every 3 consecutive docs share an image, so dup-group
    size is CONSTANT at every SF and pair volume stays linear), and
    every 13th doc gets the perturbed near-dup variant."""
    d = table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                buf = synth_noise_bmp_bytes(i // DHASH_GROUP)
                if i % DHASH_PERTURB_EVERY == 0:
                    buf = perturb_bmp_bytes(buf)
                payloads.append(buf)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(gen, schema=AUDIO_SCHEMA)


def image_dhash(images: DataFrame) -> DataFrame:
    """Decode + dHash per image inside Arrow-batched mapInPandas —
    Python IS the point here (binary container walk); everything
    downstream (banding, joins, Hamming verify) stays JVM-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash": [
                        bmp_dhash64(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return images.mapInPandas(run, schema="doc_id long, dhash long")


# --------------------------------------------- audio fingerprint dedup

# Same corpus discipline as the image dHash: sine fixtures are too
# regular for energy fingerprints (flat windowed energy), so the dedup
# corpus uses sha256-seeded noise PCM; content key = doc_id // 3 and
# every 13th doc is a volume-scaled (49/50) variant — energy ORDER is
# volume-invariant, so variants measured Hamming 0 while unrelated
# keys sit >= 16 bits apart (median 32).

AFP_N_SAMPLES = 2080  # 65 windows x 32 samples
AFP_WINDOW = 32


def synth_noise_wav_bytes(key: int) -> bytes:
    """Deterministic mono PCM16 WAV of sha256-seeded noise."""
    import hashlib
    import io
    import struct
    import wave

    stream = b""
    i = 0
    while len(stream) < AFP_N_SAMPLES * 2:
        stream += hashlib.sha256(f"wav:{key}:{i}".encode()).digest()
        i += 1
    vals = struct.unpack(f"<{AFP_N_SAMPLES}h", stream[: AFP_N_SAMPLES * 2])
    samples = [int(v / 4) for v in vals]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(struct.pack(f"<{AFP_N_SAMPLES}h", *samples))
    return buf.getvalue()


def _synth_noise_wav_bytes_np(key: int) -> bytes:
    """Byte-identical fast path of synth_noise_wav_bytes: the per-sample
    ``int(v / 4)`` Python loop becomes one numpy truncate-toward-zero
    (int(v/4) truncates; // floors — np.trunc matches the former), and
    the PCM packs via tobytes (little-endian int16, exactly struct.pack
    '<h').  Equality with the reference is law-tested."""
    import hashlib
    import io
    import wave

    import numpy as np

    stream = b""
    i = 0
    while len(stream) < AFP_N_SAMPLES * 2:
        stream += hashlib.sha256(f"wav:{key}:{i}".encode()).digest()
        i += 1
    vals = np.frombuffer(stream, dtype="<i2", count=AFP_N_SAMPLES)
    samples = np.trunc(vals / 4.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def volume_scale_wav_bytes(buf: bytes, num: int = 49, den: int = 50) -> bytes:
    """Deterministic volume change (the near-duplicate generator)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(buf), "rb") as r:
        n = r.getnframes()
        rate = r.getframerate()
        frames = r.readframes(n)
    vals = struct.unpack(f"<{n}h", frames)
    scaled = [v * num // den for v in vals]
    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n}h", *scaled))
    return out.getvalue()


def _volume_scale_wav_bytes_np(buf: bytes, num: int = 49, den: int = 50) -> bytes:
    """Byte-identical fast path of volume_scale_wav_bytes: int64
    ``* num // den`` in numpy floors exactly like Python ``//``; the
    shrink factor keeps every value in int16 range.  Equality with the
    reference is law-tested."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(buf), "rb") as r:
        n = r.getnframes()
        rate = r.getframerate()
        frames = r.readframes(n)
    vals = np.frombuffer(frames, dtype="<i2", count=n).astype(np.int64)
    scaled = (vals * num // den).astype("<i2")
    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(scaled.tobytes())
    return out.getvalue()


def wav_energy_fp64(buf: bytes) -> int:
    """64-bit energy-difference fingerprint: 65 window energies (exact
    integer sums of squares over decoded PCM), one bit per adjacent
    comparison — the 1-D dHash; invariant to uniform volume scaling
    because only the energy ORDER matters.  Signed 64-bit return."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(buf), "rb") as r:
        n = r.getnframes()
        vals = struct.unpack(f"<{n}h", r.readframes(n))
    es = [
        sum(v * v for v in vals[w * AFP_WINDOW : (w + 1) * AFP_WINDOW])
        for w in range(65)
    ]
    bits = 0
    for i in range(64):
        bits = (bits << 1) | (1 if es[i] < es[i + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _wav_energy_fp64_np(buf: bytes) -> int:
    """Bit-identical fast path of wav_energy_fp64: the per-sample
    Python sum-of-squares becomes one int64 numpy reduction (exact —
    max window energy 32768^2 * 32 << 2^63).  Equality with the
    reference is law-tested."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(buf), "rb") as r:
        n = r.getnframes()
        frames = r.readframes(n)
    vals = np.frombuffer(frames, dtype="<i2", count=65 * AFP_WINDOW).astype(
        np.int64
    )
    es = (vals * vals).reshape(65, AFP_WINDOW).sum(axis=1)
    bits = 0
    for c in es[:-1] < es[1:]:
        bits = (bits << 1) | int(c)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def synthesize_dedup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio corpus with injected duplicate structure (groups of 3
    consecutive doc_ids; every 13th doc volume-scaled).

    The doc-id list arrives as ONE parquet scan partition, which made
    the whole synth+decode chain a single serial Python task; hash-
    repartitioning on the CONTENT key (doc_id DIV group) spreads the
    Python work across every core while keeping each dup group's 3
    docs in one task, so the per-key WAV synthesizes once per group
    (a generator-local memo — per task, never across runs) instead of
    once per doc.  Row values are unchanged (fingerprints are order-
    insensitive)."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = d.repartition(nparts, (F.col("doc_id") / DHASH_GROUP).cast("long"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base: dict[int, bytes] = {}
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                key = i // DHASH_GROUP
                buf = base.get(key)
                if buf is None:
                    buf = base[key] = _synth_noise_wav_bytes_np(key)
                if i % DHASH_PERTURB_EVERY == 0:
                    buf = _volume_scale_wav_bytes_np(buf)
                payloads.append(buf)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(gen, schema=AUDIO_SCHEMA)


def audio_fingerprints(audio: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "afp": [
                        _wav_energy_fp64_np(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return audio.mapInPandas(run, schema="doc_id long, afp long")


# --------------------------------------------------- perceptual pHash


def _dct_mat(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis matrix (the JPEG/pHash transform)."""
    import numpy as np

    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def bmp_phash64(buf: bytes) -> int:
    """64-bit DCT perceptual hash (pHash): decode the 24-bit BMP to a
    luma grid, 2-D DCT-II, keep the top-left 8x8 low-frequency block,
    and emit one bit per coefficient vs the median of the 63 AC
    coefficients.  Median thresholding makes the hash invariant to
    any positive affine luma rescale except (at most) the DC bit —
    the robustness dHash's raw gradient signs don't have.  Signed
    64-bit so it lands in a Spark LongType unchanged."""
    import struct

    import numpy as np

    off = struct.unpack_from("<2sIHHI", buf, 0)[4]
    _, w, h, _, _ = struct.unpack_from("<IiiHH", buf, 14)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    luma = rows.astype(np.float64).mean(axis=2)
    coeffs = _dct_mat(h) @ luma @ _dct_mat(w).T
    block = coeffs[:8, :8].ravel()
    med = np.median(block[1:])
    bits = 0
    for v in block:
        bits = (bits << 1) | (1 if v > med else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_phash(images: DataFrame) -> DataFrame:
    """Decode + pHash per image inside Arrow-batched mapInPandas (the
    image_dhash shape: Python touches each payload once, everything
    downstream stays JVM-side)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [
                        bmp_phash64(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return images.mapInPandas(run, schema="doc_id long, phash long")
