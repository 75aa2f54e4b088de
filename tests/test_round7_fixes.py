"""Round-7 fixes: 8-bit WAV sign handling, batched MinHash signatures,
broadcast-contract guards, per-session cache registry, null-position-aware
dataset checksum, and wide-funnel checkpoint equivalence."""

import io
import math
import struct
import wave

import pytest
from pyspark.sql import functions as F


def _wav_8bit_sine(rate=8000, n=4000, freq=1000, amp=100):
    """8-bit PCM WAV: UNSIGNED samples centered at 128 per the RIFF spec."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(
            bytes(
                128 + int(amp * math.sin(2 * math.pi * freq * i / rate))
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_audio_features_8bit_unsigned(spark):
    """8-bit PCM is unsigned (0-255, midpoint 128): a quiet sine must
    report rms ≈ amp/√2 in CENTERED units. The old signed interpretation
    wrapped every sample ≥128 to negative, reporting rms ≈ 107 here."""
    from pangool_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [(1, _wav_8bit_sine())], "media_id LONG, payload BINARY"
    )
    row = audio_features(df).collect()[0]
    assert (row.n_channels, row.sample_rate, row.duration_ms) == (1, 8000, 500)
    assert abs(row.rms - 100 / math.sqrt(2)) < 2
    assert 95 <= row.peak <= 100


def test_audio_dominant_freq_8bit_unsigned(spark):
    """Exact-bin sine through the 8-bit path: rate=8000, n=4000 puts
    1000 Hz exactly on bin 500. The signed-wrap distortion injects a
    square wave at the same frequency's harmonics plus DC-adjacent
    energy; the unsigned fix reads the clean bin."""
    from pangool_spark.operators.multimodal import audio_dominant_freq

    df = spark.createDataFrame(
        [(1, _wav_8bit_sine(freq=1000))], "media_id LONG, payload BINARY"
    )
    row = audio_dominant_freq(df).collect()[0]
    assert row.dominant_hz == pytest.approx(1000.0, abs=1e-9)
    assert row.n_samples == 4000


def test_minhash_batch_signatures_bit_identical():
    """py_minhash_signatures_batch must equal py_minhash_signature
    per-row — including None for empty/whitespace texts and the short-doc
    whole-string shingle — since the streaming filter's parity claim
    rests on it."""
    import numpy as np

    from pangool_spark.operators.dedup import (
        py_minhash_signature,
        py_minhash_signatures_batch,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # repeated doc
        "quick brown fox",  # exactly n tokens
        "tiny doc",  # < n tokens -> whole-string shingle
        "",  # no shingles
        None,
        "   \t \n ",  # whitespace only
        "the quick brown fox leaps over the lazy dog",  # near-dup
    ]
    batch = py_minhash_signatures_batch(texts)
    assert len(batch) == len(texts)
    for t, got in zip(texts, batch):
        want = py_minhash_signature(t)
        if want is None:
            assert got is None
        else:
            assert np.array_equal(got, want), t


def test_stream_minhash_filter_index_guard(spark):
    """An index over max_index_rows raises BEFORE collecting, naming the
    foreachBatch scale path; a generous limit still admits the index."""
    from pangool_spark.operators.dedup import minhash_signatures
    from pangool_spark.streaming.ops import stream_minhash_filter

    corpus = spark.createDataFrame(
        [(i, f"doc number {i} with some shared words common to all") for i in range(8)],
        "doc_id LONG, text STRING",
    )
    sigs = minhash_signatures(corpus)
    with pytest.raises(ValueError, match="foreachBatch"):
        stream_minhash_filter(corpus, sigs, max_index_rows=3)
    # within contract: filter builds and runs
    out = stream_minhash_filter(corpus, sigs, max_index_rows=100, threshold=0.9)
    assert out.count() <= 8


def test_contamination_filter_bench_guard(spark):
    """A benchmark whose distinct shingles exceed max_bench_shingles
    raises, naming decontaminate() as the shuffled alternative."""
    from pangool_spark.operators.dedup import contamination_filter

    docs = spark.createDataFrame(
        [(1, "some training document text here")], "doc_id LONG, text STRING"
    )
    bench = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(40)))], "bid LONG, text STRING"
    )
    with pytest.raises(ValueError, match="decontaminate"):
        contamination_filter(docs, bench, n=3, max_bench_shingles=5)
    # within contract: behaves as before
    assert contamination_filter(docs, bench, n=3).count() == 1


def test_release_caches_per_session(spark):
    """The cache registry is keyed per SparkSession: releasing for this
    session evicts its registrations (and a second release finds none)."""
    from pangool_spark.operators import dedup

    dedup.release_caches()  # start clean
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id LONG, text STRING"
    )
    dedup._cache(df.select("doc_id"))
    assert dedup.release_caches(spark) >= 1
    assert dedup.release_caches(spark) == 0
    # None (historical behavior) sweeps everything, idempotently
    assert dedup.release_caches() == 0


def test_dataset_checksum_null_position(spark):
    """('a', NULL) and (NULL, 'a') must NOT collide: Spark's xxhash64
    skips null arguments, so the checksum interleaves null indicators."""
    from pangool_spark.operators.profile import dataset_checksum

    a = spark.createDataFrame([("a", None)], "x STRING, y STRING")
    b = spark.createDataFrame([(None, "a")], "x STRING, y STRING")
    ca = dataset_checksum(a).collect()[0]
    cb = dataset_checksum(b).collect()[0]
    assert ca.n_rows == cb.n_rows == 1
    assert ca.checksum != cb.checksum
    # still order/partition-insensitive with nulls present
    both = a.union(b)
    c1 = dataset_checksum(both).collect()[0]
    c2 = dataset_checksum(both.orderBy(F.col("y").asc_nulls_last()).repartition(7)).collect()[0]
    assert (c1.n_rows, c1.checksum) == (c2.n_rows, c2.checksum)


def test_funnel_wide_steps_checkpoint_equivalence(spark):
    """10-step funnel (the width where stepwise's lineage fan-out
    matters): stepwise, stepwise+checkpoint_levels, and fold must all
    agree with the Python greedy reference."""
    import random

    from pangool_spark.operators.funnel import funnel

    steps = [f"s{i}" for i in range(10)]
    rng = random.Random(7)
    events, used = [], set()
    for _ in range(400):
        k, t = rng.randint(0, 12), rng.randint(0, 500)
        if (k, t) in used:
            continue
        used.add((k, t))
        events.append((k, t, rng.choice(steps + ["noise"])))
    # guarantee at least one full-depth key
    events += [(99, 1000 + i, s) for i, s in enumerate(steps)]

    by_key = {}
    for k, t, e in events:
        if e in steps:
            by_key.setdefault(k, []).append((t, steps.index(e)))
    expected = {}
    for k, evs in by_key.items():
        cursor = 0
        for _, idx in sorted(evs):
            if idx == cursor:
                cursor += 1
        expected[k] = cursor

    df = spark.createDataFrame(events, "user_id LONG, ts LONG, event_type STRING")
    results = {}
    for label, kwargs in (
        ("stepwise", dict(mode="stepwise")),
        ("checkpointed", dict(mode="stepwise", checkpoint_levels=True)),
        ("fold", dict(mode="fold")),
    ):
        results[label] = {
            r.user_id: r.steps_completed
            for r in funnel(df, steps, ts_col="ts", **kwargs).collect()
        }
        assert results[label] == expected, label
    assert expected[99] == 10


def _png_gray(img) -> bytes:
    """Pure-stdlib 8-bit grayscale PNG writer — a REAL compressed-codec
    fixture with no PIL dependency on the encode side (PNG spec: IHDR
    color type 0, zlib IDAT of filter-0 scanlines)."""
    import struct
    import zlib

    import numpy as np

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape

    def chunk(typ, data):
        c = typ + data
        return (
            struct.pack(">I", len(data))
            + c
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_pil_png_decode_through_auto_seam(spark):
    """PIL-path integration (mirrors the ffmpeg video one): real PNG bytes
    through decoder='auto' must decode with PIL where it exists and skip
    cleanly elsewhere. Constant-intensity fixtures make the expectations
    closed-form regardless of PIL's resampler."""
    import numpy as np

    from pangool_spark.operators.multimodal import (
        decode_and_featurize_images,
        image_codec_available,
        resize_images,
    )

    if not image_codec_available():
        pytest.skip("PIL not installed in this container")

    png_a = _png_gray(np.full((16, 16), 200, dtype=np.uint8))
    png_b = _png_gray(np.full((32, 8), 10, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, png_a), (2, png_b)], "media_id LONG, payload BINARY"
    )
    rows = {r.media_id: r for r in decode_and_featurize_images(df, decoder="auto").collect()}
    assert rows[1].mean_intensity == pytest.approx(200.0)
    assert rows[2].mean_intensity == pytest.approx(10.0)
    assert len(rows[1].feature) == 64 and set(rows[1].feature) == {200.0}

    out = {r.media_id: r for r in resize_images(df, (4, 4), decoder="auto").collect()}
    assert out[1].payload == bytes([200] * 16)
    assert out[2].payload == bytes([10] * 16)
    assert (out[1].width, out[1].height) == (4, 4)
