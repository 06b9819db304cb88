"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is a
deterministic fake (clearly marked); everything around it — schema,
Arrow-batched mapInPandas signature, partitioning, metadata extraction — is
the real 100 TB design:

- payloads live in a ``binary`` column next to typed metadata, one row per
  asset (at scale: parquet with a large row-group size, payload column
  pruned unless projected);
- decode/feature-extract runs in ``mapInPandas`` so bytes stream through
  Arrow record batches (no per-row pickling, no driver involvement);
- derived metadata (dims, duration, hashes) is computed once and stored
  columnar so later filters never touch the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int, format string"
)


def attach_fake_payload(documents: DataFrame) -> DataFrame:
    """Manufacture a deterministic binary payload per document (UTF-8 bytes
    of the text — stands in for image bytes). Real pipelines read payloads
    with ``spark.read.format('binaryFile')`` or from parquet binary cols."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake/img").alias("mime"),
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE DECODE KERNEL — deterministic stand-in for an image decoder.

    A real implementation would `PIL.Image.open(io.BytesIO(b))`; PIL is not
    in this container. Width/height/channels are pure functions of the byte
    length so results are reproducible and oracle-checkable.
    """
    for pdf in batches:
        byte_len = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int32"),
                "width": (byte_len % 640 + 16).astype("int32"),
                "height": (byte_len % 480 + 16).astype("int32"),
                "channels": (byte_len % 3 + 1).astype("int32"),
                "format": "fakeimg",
            }
        )


def decode_image_metadata(documents: DataFrame) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas.
    This is the full multimodal plumbing path: binary column → vectorized
    Python kernel → typed columnar output."""
    with_payload = attach_fake_payload(documents)
    return with_payload.mapInPandas(_fake_decode_batch, schema=DECODED_SCHEMA)


def parse_image_header(b: bytes) -> tuple:
    """Stdlib container-header parse → (format, width, height, channels).

    Covers PNG (IHDR chunk), GIF87a/89a (logical screen descriptor),
    JPEG (SOFn frame header, marker walk), and BMP (BITMAPINFOHEADER) —
    no codec library needed for metadata: the dimensions live in the
    first bytes of each container. Pixel decoding still needs a codec;
    metadata extraction (the filter/profile path a 100 TB pipeline runs
    on every asset) does not. Unknown/truncated input → (None, ...)."""
    import struct

    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        return "png", w, h, channels
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h, 3
    if b[:2] == b"\xff\xd8":
        sof_markers = frozenset(
            range(0xC0, 0xD0)
        ) - {0xC4, 0xC8, 0xCC}  # SOFn minus DHT/JPG/DAC
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker in sof_markers:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h, b[i + 9]
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seglen
        return "jpeg", None, None, None
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", w, abs(h), 3
    return None, None, None, None


def decode_image_real(images: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL image-metadata decoder over a binary column: Arrow-batched
    mapInPandas, one parse_image_header call per payload. Same output
    schema as the fake kernel, so pipelines swap kernels freely; rows
    whose payload is not a recognized container get format='unknown' and
    null dims (quarantine-able downstream)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, cs = [], [], [], []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else b""
                fmt, w, h, c = parse_image_header(b)
                fmts.append(fmt or "unknown")
                ws.append(w)
                hs.append(h)
                cs.append(c)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(lambda p: len(p) if p is not None else 0).astype("int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                    "format": fmts,
                }
            )

    return images.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    ).mapInPandas(kernel, schema=DECODED_SCHEMA)


def decode_synthesized_real_headers(documents: DataFrame) -> DataFrame:
    """Drive the REAL container-header parser under the value oracle:
    each document manufactures a genuine GIF89a header (dims derived
    from its own metadata), and ``parse_image_header`` parses the bytes
    back inside the same Arrow batch. Round-trips real container bytes
    through the real kernel with a SQL-expressible expected result —
    the oracle-checkable twin of decode_image_real (whose inputs at
    production are arbitrary payloads)."""
    import struct

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths = (pdf["n_chars"] % 600 + 1).astype("int64")
            heights = (pdf["doc_id"] % 400 + 1).astype("int64")
            parsed = [
                parse_image_header(b"GIF89a" + struct.pack("<HH", int(w), int(h)) + b"\x00" * 4)
                for w, h in zip(widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "format": [p[0] for p in parsed],
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        kernel, schema="doc_id bigint, width int, height int, format string"
    )


def frame_sample_plan(n_frames: int = 4):
    """Frame-sampling schedule for video payloads: deterministic evenly
    spaced frame indices given a frame count — the pure-planning half of a
    video sampler (decode half stubbed like images)."""

    def indices(total_frames: int) -> list[int]:
        if total_frames <= 0:
            return []
        step = max(total_frames // n_frames, 1)
        return list(range(0, total_frames, step))[:n_frames]

    return indices


def payload_size_profile(documents: DataFrame) -> DataFrame:
    """Metadata-only profiling: byte-length stats per source WITHOUT
    decoding — the query shape that must prune the payload column at scan
    time (verify via ReadSchema in explain)."""
    with_payload = attach_fake_payload(documents).select(
        "doc_id", F.octet_length("payload").alias("byte_len")
    )
    meta = documents.select("doc_id", "source")
    return (
        meta.join(with_payload, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("byte_len").alias("total_bytes"),
            F.max("byte_len").alias("max_bytes"),
        )
        .select(
            "source",
            "n_assets",
            "total_bytes",
            # exact integer 4dp mean (round(avg(int),4) hazard class)
            (
                F.expr("(2 * total_bytes * 10000 + n_assets) div (2 * n_assets)")
                .cast("double")
                / F.lit(10000.0)
            ).alias("avg_bytes"),
            "max_bytes",
        )
    )


RESIZED_SCHEMA = (
    "doc_id bigint, orig_w int, orig_h int, new_w int, new_h int, resized_payload binary"
)


def resize_images(documents: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Aspect-preserving resize kernel over binary payloads (mapInPandas).

    The geometry (fit-within-box scale, floor, min 1px) is the real
    contract; the pixel resample is a deterministic fake (payload bytes
    truncated/cycled to the new byte budget) because no codec exists in
    this container — a real kernel swaps ONLY the inner two lines for
    PIL/cv2 calls. Output carries the resized bytes next to the metadata;
    queries that only need dimensions must prune the binary column
    (ReadSchema-checked pattern, see payload_size_profile)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            byte_len = pdf["payload"].map(len)
            w = (byte_len % 640 + 16).astype("int64")  # same fake geometry as decode
            h = (byte_len % 480 + 16).astype("int64")
            scale = pd.concat([target_w / w, target_h / h], axis=1).min(axis=1).clip(upper=1.0)
            new_w = (w * scale).astype("int64").clip(lower=1)
            new_h = (h * scale).astype("int64").clip(lower=1)
            out_bytes = [
                bytes((p * (tw * th // max(len(p), 1) + 1))[: tw * th])
                for p, tw, th in zip(pdf["payload"], new_w, new_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w.astype("int32"),
                    "orig_h": h.astype("int32"),
                    "new_w": new_w.astype("int32"),
                    "new_h": new_h.astype("int32"),
                    "resized_payload": out_bytes,
                }
            )

    return attach_fake_payload(documents).mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_video_frames(documents: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over fake 'video' payloads: one input row → up to
    ``n_frames`` output rows at evenly spaced frame indices (the
    frame_sample_plan schedule). The per-frame 'decode' is a slice hash —
    the real kernel would seek+decode those frames only, which is the
    point: sampled access, never a full decode."""
    import hashlib

    plan = frame_sample_plan(n_frames)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, fidxs, totals, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                total_frames = len(payload) % 100 + 1
                for idx in plan(total_frames):
                    doc_ids.append(doc_id)
                    fidxs.append(idx)
                    totals.append(total_frames)
                    hashes.append(hashlib.md5(payload[idx : idx + 16]).hexdigest())
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": fidxs,
                 "total_frames": totals, "frame_hash": hashes}
            )

    return attach_fake_payload(documents).mapInPandas(
        kernel, schema="doc_id bigint, frame_idx int, total_frames int, frame_hash string"
    )


def synthesize_pcm_audio(documents: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Deterministic PCM16 audio payload per document: a pure sine whose
    frequency/duration derive from (doc_id, n_chars) — raw PCM needs no
    codec, so unlike image pixels the AUDIO math path is fully real in
    this container. Stands in for decoded speech/music clips."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                freq = 100.0 + (int(doc_id) % 32) * 25.0  # 100..875 Hz
                n = sample_rate // 4 + (int(n_chars) % 100)  # ~0.25 s
                t = np.arange(n, dtype=np.float64) / sample_rate
                wave = (0.5 * np.sin(2 * np.pi * freq * t) * 32767.0).astype("<i2")
                payloads.append(wave.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "n_chars").mapInPandas(
        kernel, schema="doc_id long, payload binary"
    )


def audio_pcm_features(
    audio: DataFrame, sample_rate: int = 8000, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio feature extraction over raw PCM16 payloads: duration, RMS,
    peak, zero-crossing rate, dominant frequency via a real FFT — the
    pre-filter feature set of an audio training pipeline (silence / clip
    / bandwidth gates), as an Arrow-batched numpy kernel.

    Scale shape: map-only (no shuffle at all) — features are computed
    where the payload bytes already are, and only the tiny typed feature
    row leaves the task. At 100 TB the payload column never moves."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, durs, rmss, peaks, zcrs, doms = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                x = np.frombuffer(b[: len(b) - len(b) % 2], dtype="<i2").astype(np.float64)
                ids.append(doc_id)
                if len(x) == 0:
                    durs.append(0.0); rmss.append(0.0); peaks.append(0.0)
                    zcrs.append(0.0); doms.append(0.0)
                    continue
                xn = x / 32768.0
                durs.append(round(len(x) / sample_rate, 6))
                rmss.append(round(float(np.sqrt(np.mean(xn**2))), 6))
                peaks.append(round(float(np.abs(xn).max()), 6))
                zcrs.append(round(float(np.mean(np.abs(np.diff(np.signbit(xn))))), 6))
                spec = np.abs(np.fft.rfft(xn))
                spec[0] = 0.0  # ignore DC
                doms.append(round(float(np.argmax(spec) * sample_rate / len(x)), 3))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "duration_s": durs,
                    "rms": rmss,
                    "peak": peaks,
                    "zero_crossing_rate": zcrs,
                    "dominant_freq_hz": doms,
                }
            )

    return audio.select(id_col, payload_col).mapInPandas(
        kernel,
        schema=(
            "doc_id long, duration_s double, rms double, peak double, "
            "zero_crossing_rate double, dominant_freq_hz double"
        ),
    )


def synthesize_mp4_video(documents: DataFrame) -> DataFrame:
    """Deterministic minimal-but-VALID MP4 container per document —
    ftyp + moov(mvhd + n×trak(tkhd)) boxes with real big-endian box
    framing (ISO/IEC 14496-12 base media format, public spec). Like
    ``synthesize_pcm_audio``, the container math needs no codec, so the
    byte-level path is fully real in this container; only the media
    samples are absent (a header-only MP4 is exactly what a metadata
    pass reads anyway — players call this a 'faststart' moov probe).
    duration_s = 5 + doc_id % 20 at timescale 600; tracks = 1 + doc_id % 2."""
    import struct

    def _box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                timescale = 600
                duration = (5 + int(doc_id) % 20) * timescale
                n_tracks = 1 + int(doc_id) % 2
                ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
                mvhd = _box(
                    b"mvhd",
                    bytes(4)  # version 0 + flags
                    + struct.pack(">II", 0, 0)  # creation/modification
                    + struct.pack(">II", timescale, duration)
                    + struct.pack(">I", 0x00010000)  # rate 1.0
                    + struct.pack(">H", 0x0100)  # volume
                    + bytes(10)
                    + bytes(36)  # identity matrix slot (zeros fine for probe)
                    + bytes(24)
                    + struct.pack(">I", n_tracks + 1),  # next_track_id
                )
                traks = b""
                for tid in range(1, n_tracks + 1):
                    tkhd = _box(
                        b"tkhd",
                        bytes(4)
                        + struct.pack(">II", 0, 0)
                        + struct.pack(">I", tid)
                        + bytes(4)
                        + struct.pack(">I", duration)
                        + bytes(60),
                    )
                    traks += _box(b"trak", tkhd)
                payloads.append(ftyp + _box(b"moov", mvhd + traks))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id").mapInPandas(
        kernel, schema="doc_id long, payload binary"
    )


def parse_mp4_header(b: bytes) -> tuple:
    """Walk the top-level MP4 box structure (stdlib struct, no codec):
    brand from ftyp, timescale/duration from moov/mvhd (version 0 or 1),
    track count from moov/trak children. Returns (format, brand,
    timescale, duration_ticks, n_tracks); non-MP4 or truncated input →
    ('unknown', None, None, None, None)."""
    import struct

    def walk(buf, off, end):
        while off + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[off : off + 8])
            if size < 8 or off + size > end:
                return
            yield btype, off + 8, off + size
            off += size

    try:
        brand = timescale = duration = None
        n_tracks = 0
        saw_moov = False
        for btype, body, bend in walk(b, 0, len(b)):
            if btype == b"ftyp" and bend - body >= 4:
                brand = b[body : body + 4].decode("ascii", "replace")
            elif btype == b"moov":
                saw_moov = True
                for ctype, cbody, cend in walk(b, body, bend):
                    if ctype == b"mvhd" and cend - cbody >= 4:
                        version = b[cbody]
                        if version == 0 and cend - cbody >= 20:
                            timescale, duration = struct.unpack(
                                ">II", b[cbody + 12 : cbody + 20]
                            )
                        elif version == 1 and cend - cbody >= 32:
                            timescale = struct.unpack(">I", b[cbody + 20 : cbody + 24])[0]
                            duration = struct.unpack(">Q", b[cbody + 24 : cbody + 32])[0]
                    elif ctype == b"trak":
                        n_tracks += 1
        if not saw_moov or timescale is None:
            return ("unknown", None, None, None, None)
        return ("mp4", brand, int(timescale), int(duration), n_tracks)
    except Exception:
        return ("unknown", None, None, None, None)


VIDEO_SCHEMA = (
    "doc_id bigint, format string, brand string, timescale int, "
    "duration_ticks bigint, duration_s double, n_tracks int"
)


def decode_video_real(videos: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched real MP4 header decode: binary column in, typed
    metadata out — the video twin of ``decode_image_real`` (payload
    bytes never shuffle; the kernel is map-only)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_mp4_header(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": [r[0] for r in rows],
                    "brand": [r[1] for r in rows],
                    "timescale": pd.array([r[2] for r in rows], dtype="Int32"),
                    "duration_ticks": pd.array([r[3] for r in rows], dtype="Int64"),
                    "duration_s": [
                        (r[3] / r[2]) if r[2] else None for r in rows
                    ],
                    "n_tracks": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return videos.mapInPandas(kernel, schema=VIDEO_SCHEMA)


def video_metadata(documents: DataFrame) -> DataFrame:
    """Synthesize → parse round-trip over real MP4 container bytes; the
    output is a pure function of doc_id, so the DuckDB oracle recomputes
    it symbolically — proving the box writer and the box walker agree
    byte-for-byte (the audio-physics pattern applied to video)."""
    return decode_video_real(synthesize_mp4_video(documents))


def synthesize_wav_audio(documents: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Wrap the deterministic sine payloads of ``synthesize_pcm_audio``
    in a real RIFF/WAVE container (fmt + data chunks, little-endian —
    the public WAVE format): same audio math, now with the header a real
    ingest pipeline actually sees. n_samples = sample_rate/4 +
    n_chars % 100, mono PCM16."""
    import struct

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                freq = 100.0 + (int(doc_id) % 32) * 25.0
                n = sample_rate // 4 + (int(n_chars) % 100)
                t = np.arange(n, dtype=np.float64) / sample_rate
                pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767.0).astype("<i2").tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(pcm)) + pcm
                )
                payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "n_chars").mapInPandas(
        kernel, schema="doc_id long, payload binary"
    )


def parse_wav_header(b: bytes) -> tuple:
    """RIFF/WAVE chunk walk (stdlib struct): (format, n_channels,
    sample_rate, bits_per_sample, n_samples) from the fmt and data
    chunks; anything malformed → ('unknown', None, None, None, None)."""
    import struct

    try:
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return ("unknown", None, None, None, None)
        off, end = 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
        channels = rate = bits = data_len = None
        while off + 8 <= end:
            ctype = b[off : off + 4]
            clen = struct.unpack("<I", b[off + 4 : off + 8])[0]
            if off + 8 + clen > len(b):
                break
            if ctype == b"fmt " and clen >= 16:
                _fmt, channels, rate, _bps, block, bits = struct.unpack(
                    "<HHIIHH", b[off + 8 : off + 24]
                )
            elif ctype == b"data":
                data_len = clen
            off += 8 + clen + (clen & 1)  # chunks are word-aligned
        if channels is None or data_len is None:
            return ("unknown", None, None, None, None)
        n_samples = data_len // (channels * max(bits // 8, 1))
        return ("wav", int(channels), int(rate), int(bits), int(n_samples))
    except Exception:
        return ("unknown", None, None, None, None)


AUDIO_META_SCHEMA = (
    "doc_id bigint, format string, n_channels int, sample_rate int, "
    "bits_per_sample int, n_samples bigint, duration_s double"
)


def decode_audio_real(audio: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched real WAV header decode — the audio twin of
    ``decode_image_real``/``decode_video_real`` (map-only, payload bytes
    never shuffle)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_wav_header(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": [r[0] for r in rows],
                    "n_channels": pd.array([r[1] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[2] for r in rows], dtype="Int32"),
                    "bits_per_sample": pd.array([r[3] for r in rows], dtype="Int32"),
                    "n_samples": pd.array([r[4] for r in rows], dtype="Int64"),
                    "duration_s": [
                        (r[4] / r[2]) if r[2] else None for r in rows
                    ],
                }
            )

    return audio.mapInPandas(kernel, schema=AUDIO_META_SCHEMA)


def audio_metadata(documents: DataFrame) -> DataFrame:
    """Synthesize → parse round-trip over real RIFF/WAVE bytes; output
    is a pure function of (doc_id, n_chars) → symbolic DuckDB oracle
    (the mm_video_metadata pattern for audio containers)."""
    return decode_audio_real(synthesize_wav_audio(documents))


def aspect_ratio_buckets(documents: DataFrame) -> DataFrame:
    """Aspect-ratio bucketing report — the batching strategy image/
    video training uses instead of square-cropping (NovelAI's SDXL
    bucketing; patch-count balancing in ViT pipelines): group assets
    by rounded aspect ratio so each batch resizes to ONE shape with
    minimal distortion, and report per-bucket volume so the loader can
    size its bucket queues.

    Runs on the full multimodal plumbing path (payload →
    ``decode_image_metadata``'s Arrow-batched mapInPandas → typed
    width/height) and rolls up relationally after the kernel.

    Integer-exact: the bucket is round(10·w/h) computed as
    (20w + h) div 2h — integer half-up, never a float ratio whose .5
    could round differently; pixel sums and the per-image mean use the
    exact integer-division discipline.

    100 TB shape: the decode kernel is map-only (payload bytes never
    shuffle); only (bucket, w·h) pairs reach the one map-side-combined
    aggregate."""
    meta = decode_image_metadata(documents)
    return (
        meta.filter(F.col("width").isNotNull() & (F.col("height") > 0))
        .select(
            F.expr("(20 * width + height) div (2 * height)")
            .cast("int")
            .alias("ar_decile"),
            (F.col("width").cast("long") * F.col("height")).alias("pixels"),
            "width",
        )
        .groupBy("ar_decile")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum("pixels").cast("long").alias("total_pixels"),
            F.expr("sum(pixels) div count(*)").cast("long").alias("px_per_image"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
        )
        .orderBy("ar_decile")
    )
