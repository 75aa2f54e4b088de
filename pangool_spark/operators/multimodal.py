"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension over the reference (whose OBJECT fields with pluggable Hadoop
serializations — ``P/io/Schema.java:223-238,516-535`` — are the closest
analog: opaque payload + codec at the boundary).

Design for 100 TB: media bytes ride in a ``binary`` column next to typed
metadata; all decode/feature work happens in ``mapInPandas`` over Arrow
batches so bytes never round-trip through Python row-by-row, and the
pipeline partitions by size (``repartitioned_by_bytes``) so one huge video
can't skew an executor.

The actual image/audio codecs are NOT in this container, so ``decode_*``
raise ``NotImplementedError`` unless ``fake=True`` — the deterministic fake
exercises the full Spark plumbing (schema, batching, partitioning) and is
what the tests pin down.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media-table schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def media_stats(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass: payload size + md5, pure column expressions."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("digest"),
    )


def repartitioned_by_bytes(df: DataFrame, payload_col: str = "payload", target_mb: int = 64) -> DataFrame:
    """Rebalance so each partition holds ~target_mb of payload bytes.

    At 100 TB, media rows are wildly skewed in size; salting by a
    byte-weighted bucket keeps decode stages even. Uses an approximate total
    from a metadata aggregate — one cheap pass — then repartitions by a
    random-ish hash (md5 of payload head) into the computed bucket count.
    """
    total = df.select(F.sum(F.length(payload_col)).alias("b")).collect()[0]["b"] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(n_parts, F.crc32(F.substring(F.col(payload_col).cast("string"), 1, 64)))


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic fake: 8x8 grayscale derived from payload bytes."""
    seed = np.frombuffer((payload or b"\x00")[:64].ljust(64, b"\x00"), dtype=np.uint8)
    return np.tile(seed, (64 // len(seed) + 1,))[:64].reshape(8, 8).astype(np.float32)


def _pil_decode_image(payload: bytes) -> np.ndarray:
    """Real decode (PIL): grayscale 8x8 thumbnail, same shape/dtype contract
    as the fake so downstream features are drop-in identical."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(
            img.convert("L").resize((8, 8)), dtype=np.float32
        )


def image_codec_available() -> bool:
    """True when a real image codec (PIL) is importable — the integration
    seam: ``decoder='auto'`` uses it automatically on clusters that ship it."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_and_featurize_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
    decoder: str = "auto",
) -> DataFrame:
    """Decode image payloads and emit a feature vector per image.

    ``decoder`` selects the codec behind the SAME Spark plumbing
    (Arrow-batched ``mapInPandas``, explicit output schema, per-batch
    numpy): ``'auto'`` uses PIL when importable and otherwise raises,
    ``'pil'`` requires PIL, ``'fake'`` (or the legacy ``fake=True``) is the
    deterministic stub the container tests pin. The plumbing — schema,
    batching, partitioning — is identical for all three, so a cluster with
    PIL installed gets real decode with zero plan changes.
    """
    if fake:
        decoder = "fake"
    if decoder == "auto":
        decoder = "pil" if image_codec_available() else "missing"
    if decoder == "pil" and not image_codec_available():
        decoder = "missing"
    if decoder == "missing":
        raise NotImplementedError(
            "image codecs (PIL/opencv) are not available in this environment; "
            "pass fake=True for the deterministic stub decode"
        )
    if decoder not in ("pil", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")
    decode = _pil_decode_image if decoder == "pil" else _fake_decode_image

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("mean_intensity", T.DoubleType(), True),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, feats = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode(payload)
                ids.append(mid)
                means.append(float(img.mean()))
                feats.append(img.ravel().tolist())
            yield pd.DataFrame({id_col: ids, "mean_intensity": means, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def _resize_nearest(img: "np.ndarray", tw: int, th: int) -> "np.ndarray":
    """Deterministic nearest-neighbor resize (floor-center sampling):
    out[y, x] = in[(y*H)//th, (x*W)//tw]."""
    h, w = img.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[np.ix_(ys, xs)]


def resize_images(
    df: DataFrame,
    target: tuple[int, int],
    id_col: str = "media_id",
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    decoder: str = "auto",
) -> DataFrame:
    """Resize image payloads to ``target`` (width, height) → (id, payload,
    width, height) with payload = raw row-major 8-bit grayscale bytes.

    Decoders behind the SAME Arrow plumbing (mirrors
    ``decode_and_featurize_images``'s seam):

    - ``'raw'`` — REAL in-container path: payload is raw L8 bytes with
      dimensions in ``width_col``/``height_col`` (the binary+metadata
      multimodal column model); pure-numpy nearest-neighbor resize,
      deterministic and value-testable.
    - ``'pil'`` — real compressed-codec decode (PNG/JPEG) via PIL when
      importable.
    - ``'fake'`` — the deterministic 8×8 stub decode, then resize.
    - ``'auto'`` — PIL when importable, else the raw path.

    Nearest-neighbor (not bilinear) keeps the kernel integer-exact, so the
    same bytes come out on every engine/BLAS — the property every other
    oracle-checked operator here preserves.
    """
    tw, th = int(target[0]), int(target[1])
    if tw <= 0 or th <= 0:
        raise ValueError("target dims must be positive")
    if decoder == "auto":
        decoder = "pil" if image_codec_available() else "raw"
    if decoder == "pil" and not image_codec_available():
        raise NotImplementedError(
            "PIL is not available; use decoder='raw' for raw-grayscale "
            "payloads or 'fake' for the stub"
        )
    if decoder not in ("raw", "pil", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    cols = [id_col, payload_col] + (
        [width_col, height_col] if decoder == "raw" else []
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                if decoder == "pil":
                    # full-resolution decode, PIL's own resampler
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(payload)) as im:
                        resized = np.asarray(
                            im.convert("L").resize((tw, th), Image.NEAREST),
                            dtype=np.uint8,
                        )
                else:
                    if decoder == "raw":
                        w, h = int(row[width_col]), int(row[height_col])
                        img = np.frombuffer(payload, dtype=np.uint8)[: w * h].reshape(h, w)
                    else:
                        img = _fake_decode_image(payload).astype(np.uint8)
                    resized = _resize_nearest(img, tw, th)
                ids.append(row[id_col])
                payloads.append(resized.tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "width": [tw] * len(ids),
                    "height": [th] * len(ids),
                }
            )

    return df.select(*cols).mapInPandas(run, schema=out_schema)


def synthesize_y4m(
    frames: "list[np.ndarray]", fps: tuple[int, int] = (30, 1), colorspace: str = "mono"
) -> bytes:
    """Encode grayscale frames as an uncompressed Y4M (YUV4MPEG2) stream —
    the public format ffmpeg emits with ``-f yuv4mpeg``. Used to build
    deterministic real-video fixtures; ``_y4m_decode_frame`` is the decoder.
    ``colorspace='420'`` pads neutral-gray chroma planes; ``'mono'`` writes
    luma only."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    chroma = (
        np.full(((h // 2) * (w // 2)), 128, dtype=np.uint8).tobytes() * 2
        if colorspace.startswith("420")
        else b""
    )
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)


def _y4m_decode_frame(payload: bytes, frame_ms: int) -> np.ndarray:
    """REAL video decode for uncompressed Y4M (YUV4MPEG2) payloads — pure
    numpy, no external binary, so this path runs for real in this container
    (the video analog of the stdlib-``wave`` audio decode; ffmpeg stays the
    seam for compressed codecs). Parses the stream header
    (width/height/framerate/colorspace), indexes the FRAME at ``frame_ms``,
    and pools its luma plane to the 8x8 grayscale contract shared by the
    fake and ffmpeg decoders (block mean when the geometry divides evenly,
    nearest-neighbor otherwise)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    header_end = payload.index(b"\n")
    w = h = None
    num, den = 30, 1
    cs = b"420"
    for tag in payload[:header_end].split(b" ")[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F":
            num, den = (int(x) for x in tag[1:].split(b":"))
        elif tag[:1] == b"C":
            cs = tag[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if cs.startswith(b"mono"):
        frame_bytes = w * h
    elif cs.startswith(b"420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif cs.startswith(b"422"):
        frame_bytes = w * h + 2 * ((w // 2) * h)
    elif cs.startswith(b"444"):
        frame_bytes = 3 * w * h
    else:
        raise ValueError(f"unsupported y4m colorspace {cs!r}")
    idx = int(frame_ms * num // (1000 * den))
    pos = header_end + 1
    frame_start = None
    for _ in range(idx + 1):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"frame {idx} out of range")
        pos = payload.index(b"\n", pos) + 1  # FRAME line may carry params
        frame_start = pos
        pos += frame_bytes
    y = np.frombuffer(payload[frame_start : frame_start + w * h], dtype=np.uint8)
    if len(y) < w * h:
        raise ValueError("truncated y4m frame")
    y = y.reshape(h, w)
    if h % 8 == 0 and w % 8 == 0:
        g = y.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        g = y[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8]
    return g.astype(np.float32)


def video_codec_available() -> bool:
    """True when an ffmpeg binary is on PATH — the video analog of
    ``image_codec_available``. ``sample_video_frames(decoder='auto')``
    upgrades to real frame decode on clusters that ship it."""
    import shutil

    return shutil.which("ffmpeg") is not None


def _ffmpeg_decode_frame(payload: bytes, frame_ms: int) -> np.ndarray:
    """Real frame decode: ffmpeg extracts the frame at ``frame_ms`` as an
    8x8 grayscale rawvideo buffer — same shape/dtype contract as the fake.
    Only called when ``video_codec_available()``."""
    import subprocess

    out = subprocess.run(
        [
            "ffmpeg", "-v", "error",
            "-ss", f"{frame_ms / 1000:.3f}",
            "-i", "pipe:0",
            "-frames:v", "1",
            "-vf", "scale=8:8,format=gray",
            "-f", "rawvideo", "pipe:1",
        ],
        input=payload,
        capture_output=True,
        check=True,
    ).stdout
    return np.frombuffer(out[:64].ljust(64, b"\x00"), dtype=np.uint8).reshape(
        8, 8
    ).astype(np.float32)


def cdc_chunks(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
) -> DataFrame:
    """Content-defined chunking of binary payloads (FastCDC-style): cut
    where a windowed Gear hash of the trailing 16 bytes hits a divisor
    pattern, bounded by min/max chunk sizes. Because boundaries depend on
    CONTENT, shared byte ranges between two payloads produce identical
    chunk digests regardless of their offsets — the dedup property
    fixed-size blocks can't give (a one-byte insertion only perturbs the
    chunks around the edit).

    Per-payload the hash array is one vectorized numpy pass
    (sliding-window gear lookup @ weights); only the candidate cut points
    (~1/avg_size of positions) are walked sequentially for the size
    bounds. Arrow-batched ``mapInPandas``, same scale shape as the other
    media kernels — pair with ``repartitioned_by_bytes`` for skew.

    Output: (id, chunk_idx, offset, length, digest=md5 of chunk bytes).
    """
    import hashlib

    from pyspark.sql import types as T

    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    w = 16
    rng = np.random.RandomState(2718)
    gear = rng.randint(0, 1 << 62, size=256, dtype=np.int64)
    weights = (np.int64(1) << np.arange(w, dtype=np.int64))
    divisor = np.int64(max(1, avg_size))

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("digest", T.StringType(), False),
        ]
    )

    def cuts_for(payload: bytes) -> list[int]:
        n = len(payload)
        if n <= min_size or n < w:
            # n < w: too short for the gear window — one chunk, no hashing
            return [n] if n else []
        g = gear[np.frombuffer(payload, dtype=np.uint8)]
        # H[i] = hash of bytes [i, i+w); candidate cut AFTER byte i+w-1
        h = np.lib.stride_tricks.sliding_window_view(g, w) @ weights
        candidates = (np.flatnonzero(h % divisor == 0) + w).tolist()
        cuts, prev = [], 0
        for c in candidates:
            if c - prev < min_size:
                continue
            while c - prev > max_size:  # forced cuts inside long gaps
                prev += max_size
                cuts.append(prev)
            if c - prev < min_size:
                # the forced cuts moved prev past the min_size test above;
                # a candidate this close after a forced cut would emit an
                # undersized mid-payload chunk — wait for the next one
                continue
            cuts.append(c)
            prev = c
        while n - prev > max_size:
            prev += max_size
            cuts.append(prev)
        if prev < n:
            cuts.append(n)
        return cuts

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload or b"")
                prev = 0
                for idx, cut in enumerate(cuts_for(payload)):
                    rows.append(
                        (
                            mid,
                            idx,
                            prev,
                            cut - prev,
                            hashlib.md5(payload[prev:cut]).hexdigest(),
                        )
                    )
                    prev = cut
            yield pd.DataFrame(
                rows, columns=[id_col, "chunk_idx", "offset", "length", "digest"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """REAL audio decode for PCM WAV payloads — stdlib ``wave`` + numpy, no
    external codec needed, so unlike images this path runs for real in this
    container. Per payload: channel count, sample rate, duration, RMS and
    peak amplitude (int16/int8/int32 PCM). Non-WAV/corrupt payloads yield
    null features (``strict=True`` re-raises instead — fail the job, not
    the row, when the table is supposed to be clean).

    Same scale shape as the image path: Arrow-batched ``mapInPandas``,
    bytes never leave the executor, pair with ``repartitioned_by_bytes``
    for skew.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("peak", T.DoubleType(), True),
        ]
    )
    # 8-bit PCM WAV is UNSIGNED (0-255, midpoint 128) per the RIFF spec;
    # 16/32-bit are signed two's complement.
    _widths = {1: np.uint8, 2: np.int16, 4: np.int32}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
                        n = w.getnframes()
                        samples = np.frombuffer(w.readframes(n), dtype=_widths[width])
                    x = samples.astype(np.float64)
                    if width == 1:
                        x -= 128.0
                    rows.append(
                        (
                            mid,
                            nch,
                            rate,
                            int(n * 1000 / rate) if rate else None,
                            float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                            float(np.abs(x).max()) if len(x) else 0.0,
                        )
                    )
                except Exception:
                    if strict:
                        raise
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_channels", "sample_rate", "duration_ms", "rms", "peak"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    fake: bool = False,
    decoder: str = "none",
) -> DataFrame:
    """Frame-sample videos: one output row per sampled frame timestamp.

    Frame *timestamps* come from pure column expressions (sequence over the
    duration); frame *decode* is stubbed like images. This keeps the fan-out
    (rows-per-video) declarative so Catalyst sizes partitions after the
    explode.
    """
    ts = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
    ).alias("frame_ms")
    frames = df.select(F.col(id_col), F.col(payload_col), ts)
    # decoder seam, like images, but OPT-IN (real video payloads only):
    # decoder='ffmpeg' requires the binary (compressed codecs), 'y4m' is the
    # pure-numpy uncompressed decoder that runs everywhere, 'auto' prefers
    # ffmpeg when on PATH and otherwise stays plumbing-only; the default
    # ('none') never decodes, so timestamp-grid callers behave identically
    # on every cluster.
    if decoder not in ("none", "auto", "ffmpeg", "y4m"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "ffmpeg" and not video_codec_available():
        raise NotImplementedError("ffmpeg is not on PATH; decoder='ffmpeg' unavailable")
    use_ffmpeg = not fake and (
        decoder == "ffmpeg" or (decoder == "auto" and video_codec_available())
    )
    use_y4m = not fake and decoder == "y4m"
    if not fake and not use_ffmpeg and not use_y4m:
        return frames.select(id_col, "frame_ms")  # plumbing-only: no decode

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fake path: timestamp PREPENDED — the stub reads only the first
            # 64 bytes, so appending it would vanish for payloads >= 64B and
            # every frame of a video would get identical features
            if use_ffmpeg:
                feats = [
                    _ffmpeg_decode_frame(p or b"", int(ms)).ravel().tolist()
                    for p, ms in zip(pdf[payload_col], pdf["frame_ms"])
                ]
            elif use_y4m:
                feats = [
                    _y4m_decode_frame(p or b"", int(ms)).ravel().tolist()
                    for p, ms in zip(pdf[payload_col], pdf["frame_ms"])
                ]
            else:
                feats = [
                    _fake_decode_image(int(ms).to_bytes(8, "little") + (p or b"")).ravel().tolist()
                    for p, ms in zip(pdf[payload_col], pdf["frame_ms"])
                ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "frame_ms": pdf["frame_ms"], "frame_feature": feats}
            )

    return frames.mapInPandas(run, schema=out_schema)


def _y4m_iter_luma(payload: bytes):
    """Yield every frame's full-resolution luma plane from a YUV4MPEG2
    stream (shared parser core with ``_y4m_decode_frame``, which pools a
    single indexed frame; consumers that need CONSECUTIVE frames — scene
    cuts, motion stats — decode each frame exactly once through this)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    header_end = payload.index(b"\n")
    w = h = None
    cs = b"420"
    for tag in payload[:header_end].split(b" ")[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            cs = tag[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if cs.startswith(b"mono"):
        frame_bytes = w * h
    elif cs.startswith(b"420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif cs.startswith(b"422"):
        frame_bytes = w * h + 2 * ((w // 2) * h)
    elif cs.startswith(b"444"):
        frame_bytes = 3 * w * h
    else:
        raise ValueError(f"unsupported y4m colorspace {cs!r}")
    pos = header_end + 1
    while payload.startswith(b"FRAME", pos):
        pos = payload.index(b"\n", pos) + 1
        y = np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8)
        if len(y) < w * h:
            raise ValueError("truncated y4m frame")
        yield y.reshape(h, w)
        pos += frame_bytes


def detect_scene_cuts(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    threshold: float = 24.0,
    strict: bool = False,
) -> DataFrame:
    """REAL scene-cut detection on uncompressed Y4M video: mean absolute
    luma difference between every consecutive frame pair, flagged as a
    cut when it clears ``threshold`` — the shot-boundary pass a
    multimodal training pipeline runs before frame sampling (sample
    per-shot, not per-wall-clock, so a 2-hour static shot doesn't drown
    the montage). Pure numpy, no external binary; ffmpeg stays the seam
    for compressed codecs, same contract as ``sample_video_frames``.

    One row per consecutive pair: (id, frame_idx ≥ 1, mean_abs_diff,
    is_cut). Each clip decodes ONCE, streaming frame pairs (two planes in
    memory at a time, not the whole clip). Corrupt payloads yield a null
    row (``strict=True`` re-raises). Arrow-batched ``mapInPandas``; one
    task holds one clip — pair with ``repartitioned_by_bytes`` for skew.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("mean_abs_diff", T.DoubleType(), True),
            T.StructField("is_cut", T.BooleanType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    prev = None
                    for k, luma in enumerate(_y4m_iter_luma(bytes(payload or b""))):
                        if prev is not None:
                            d = float(
                                np.abs(
                                    luma.astype(np.float64) - prev.astype(np.float64)
                                ).mean()
                            )
                            rows.append((mid, k, d, d >= threshold))
                        prev = luma
                except Exception:
                    if strict:
                        raise
                    rows.append((mid, None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "mean_abs_diff", "is_cut"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_dominant_freq(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """REAL spectral analysis of PCM WAV payloads: stdlib ``wave`` decode
    → numpy rFFT → the non-DC bin with the largest magnitude, reported in
    Hz — the tone/voicing feature a speech-vs-music-vs-noise router runs
    at ingest. Multi-channel audio is averaged to mono before the
    transform; ties break toward the lower bin (argmax), keeping the
    result deterministic.

    Output: (id, sample_rate, n_samples, dominant_hz). Corrupt payloads
    yield null features (``strict=True`` re-raises). Same scale shape as
    ``audio_features``: Arrow-batched, bytes never leave the executor.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("dominant_hz", T.DoubleType(), True),
        ]
    )
    # 8-bit PCM WAV is UNSIGNED (0-255, midpoint 128) per the RIFF spec.
    _widths = {1: np.uint8, 2: np.int16, 4: np.int32}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        nch, width, rate = (
                            w.getnchannels(), w.getsampwidth(), w.getframerate()
                        )
                        n = w.getnframes()
                        samples = np.frombuffer(
                            w.readframes(n), dtype=_widths[width]
                        )
                    x = samples.astype(np.float64)
                    if width == 1:
                        x -= 128.0
                    if nch > 1:
                        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
                    if len(x) < 2:
                        rows.append((mid, rate, len(x), None))
                        continue
                    mag = np.abs(np.fft.rfft(x))
                    bin_idx = 1 + int(np.argmax(mag[1:]))  # skip DC
                    rows.append(
                        (mid, rate, len(x), float(bin_idx * rate / len(x)))
                    )
                except Exception:
                    if strict:
                        raise
                    rows.append((mid, None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "n_samples", "dominant_hz"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_rms_silence(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_ms: int = 25,
    silence_threshold: float = 1.0,
    strict: bool = False,
) -> DataFrame:
    """REAL loudness + silence gating of PCM WAV payloads — the
    voice-activity/dead-air filter an audio ingest pipeline runs before
    anything expensive: stdlib ``wave`` decode → overall RMS level →
    per-frame RMS over fixed ``frame_ms`` windows → the fraction of
    frames quieter than ``silence_threshold`` (strict <). Multi-channel
    audio averages to mono first (the ``audio_dominant_freq`` contract);
    the trailing partial frame is ignored (documented: only complete
    windows are gated). 8-bit PCM is unsigned per the RIFF spec
    (midpoint 128).

    Determinism note: sample values decode to exact small integers, so
    sums of squares stay exact int64-in-float64 and the single
    mean-divide + IEEE sqrt are exact-rounded — which is what lets the
    catalog query value-oracle this DSP path with closed-form
    square-wave fixtures.

    Output: (id, sample_rate, n_samples, rms, n_frames, n_silent,
    silence_fraction). Corrupt payloads yield null features
    (``strict=True`` re-raises). Arrow-batched ``mapInPandas``; bytes
    never leave the executor.
    """
    if frame_ms < 1:
        raise ValueError(f"frame_ms must be >= 1, got {frame_ms}")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("n_silent", T.LongType(), True),
            T.StructField("silence_fraction", T.DoubleType(), True),
        ]
    )
    _widths = {1: np.uint8, 2: np.int16, 4: np.int32}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        nch, width, rate = (
                            w.getnchannels(), w.getsampwidth(), w.getframerate()
                        )
                        n = w.getnframes()
                        samples = np.frombuffer(
                            w.readframes(n), dtype=_widths[width]
                        )
                    x = samples.astype(np.float64)
                    if width == 1:
                        x -= 128.0
                    if nch > 1:
                        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
                    if len(x) == 0:
                        rows.append((mid, rate, 0, None, 0, 0, None))
                        continue
                    sq = x * x
                    rms = float(np.sqrt(np.sum(sq) / len(x)))
                    flen = (rate * frame_ms) // 1000
                    if flen < 1:
                        raise ValueError(
                            f"frame_ms={frame_ms} is shorter than one "
                            f"sample at {rate} Hz"
                        )
                    nf = len(x) // flen
                    if nf == 0:
                        rows.append((mid, rate, len(x), rms, 0, 0, None))
                        continue
                    frames = sq[: nf * flen].reshape(nf, flen)
                    frms = np.sqrt(frames.sum(axis=1) / flen)
                    nsil = int(np.count_nonzero(frms < silence_threshold))
                    rows.append(
                        (
                            mid, rate, len(x), rms, nf, nsil,
                            float(nsil) / float(nf),
                        )
                    )
                except Exception:
                    if strict:
                        raise
                    rows.append((mid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_samples", "rms",
                    "n_frames", "n_silent", "silence_fraction",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    hash_size: int = 8,
    decoder: str = "auto",
) -> DataFrame:
    """Perceptual DIFFERENCE HASH (dHash) of image payloads — the
    image-dedup primitive: nearest-neighbor resample to
    (hash_size+1) × hash_size grayscale, emit one bit per adjacent
    horizontal pair (left > right), pack row-major MSB-first to a hex
    string. Near-identical images (recompression, minor crops/noise)
    collide or differ in a few bits; exact grouping on the hash is the
    map-side image-dedup pass, hamming banding the near-dup one.

    Same decoder seam as ``resize_images`` ('raw' = real in-container
    L8 bytes + dimensions, 'pil' = compressed codecs when importable,
    'fake' = deterministic stub). The whole kernel is integer-exact
    (NN sampling + comparisons), so raw-path hashes are value-oracle-able
    with closed-form sampled positions. Output: (id, dhash hex string of
    2·hash_size² bits / 4 chars). Corrupt/undersized payloads yield NULL.
    """
    if hash_size < 1:
        raise ValueError(f"hash_size must be >= 1, got {hash_size}")
    if decoder == "auto":
        decoder = "pil" if image_codec_available() else "raw"
    if decoder == "pil" and not image_codec_available():
        raise NotImplementedError(
            "PIL is not available; use decoder='raw' or 'fake'"
        )
    if decoder not in ("raw", "pil", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("dhash", T.StringType(), True),
        ]
    )
    cols = [id_col, payload_col] + (
        [width_col, height_col] if decoder == "raw" else []
    )
    hs = hash_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                try:
                    payload = row[payload_col]
                    if decoder == "pil":
                        import io

                        from PIL import Image

                        with Image.open(io.BytesIO(payload)) as im:
                            img = np.asarray(im.convert("L"), dtype=np.uint8)
                    elif decoder == "raw":
                        w, h = int(row[width_col]), int(row[height_col])
                        if w < 1 or h < 1 or len(payload) < w * h:
                            raise ValueError("undersized payload")
                        img = np.frombuffer(payload, dtype=np.uint8)[
                            : w * h
                        ].reshape(h, w)
                    else:
                        img = _fake_decode_image(payload).astype(np.uint8)
                    sh, sw = img.shape
                    ys = (np.arange(hs) * sh) // hs
                    xs = (np.arange(hs + 1) * sw) // (hs + 1)
                    small = img[np.ix_(ys, xs)].astype(np.int16)
                    bits = (small[:, :-1] > small[:, 1:]).flatten()
                    rows.append(
                        (row[id_col], bytes(np.packbits(bits)).hex())
                    )
                except Exception:
                    rows.append((row[id_col], None))
            yield pd.DataFrame(rows, columns=[id_col, "dhash"])

    return df.select(*cols).mapInPandas(run, schema=out_schema)


def audio_voiced_segments(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_ms: int = 25,
    silence_threshold: float = 1.0,
    strict: bool = False,
) -> DataFrame:
    """VAD-style audio SEGMENTATION — the chunking step after
    ``audio_rms_silence``'s gating: decode the WAV, compute per-frame
    RMS over fixed ``frame_ms`` windows, and emit one row per maximal
    CONTIGUOUS run of voiced frames (rms ≥ ``silence_threshold``) — the
    'cut the recording into utterances' primitive every speech-data
    pipeline runs before transcription/embedding.

    Same decode contract as ``audio_rms_silence`` (stdlib wave, mono
    average, unsigned 8-bit midpoint 128, trailing partial frame
    ignored); the run-length encoding is one numpy diff per file inside
    the same Arrow batch — no second decode, no per-frame rows ever
    leave the executor (segments are typically 100-1000× fewer than
    frames). Corrupt payloads yield a single null-segment row
    (``strict=True`` re-raises).

    Output: (id, segment_idx, start_frame, n_frames) — segment_idx
    0-based in time order; fully-silent files are absent from the
    output (no voice, no segments); corrupt files emit one
    (id, NULL, NULL, NULL) row so ingest can count them.
    """
    if frame_ms < 1:
        raise ValueError(f"frame_ms must be >= 1, got {frame_ms}")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("segment_idx", T.IntegerType(), True),
            T.StructField("start_frame", T.LongType(), True),
            T.StructField("n_frames", T.LongType(), True),
        ]
    )
    _widths = {1: np.uint8, 2: np.int16, 4: np.int32}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        nch, width, rate = (
                            w.getnchannels(),
                            w.getsampwidth(),
                            w.getframerate(),
                        )
                        n = w.getnframes()
                        samples = np.frombuffer(
                            w.readframes(n), dtype=_widths[width]
                        )
                    x = samples.astype(np.float64)
                    if width == 1:
                        x = x - 128.0
                    if nch > 1:
                        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(
                            axis=1
                        )
                    spf = (rate * frame_ms) // 1000
                    if spf < 1:
                        raise ValueError("frame shorter than one sample")
                    nf = len(x) // spf
                    if nf == 0:
                        continue
                    frames = x[: nf * spf].reshape(nf, spf)
                    rms = np.sqrt((frames * frames).mean(axis=1))
                    voiced = rms >= silence_threshold
                    if not voiced.any():
                        continue
                    # run-length encode the voiced mask
                    padded = np.diff(
                        np.concatenate(([0], voiced.view(np.int8), [0]))
                    )
                    starts = np.flatnonzero(padded == 1)
                    ends = np.flatnonzero(padded == -1)
                    for k, (s, e) in enumerate(zip(starts, ends)):
                        rows.append((mid, k, int(s), int(e - s)))
                except Exception:
                    if strict:
                        raise
                    rows.append((mid, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "segment_idx", "start_frame", "n_frames"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
