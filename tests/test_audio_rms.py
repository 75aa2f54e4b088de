"""audio_rms_silence: closed-form square/constant signals, stereo
averaging, 8-bit unsigned midpoint, partial-frame truncation, corrupt
payload handling."""

import io
import math
import wave

import numpy as np
import pytest

from pangool_spark.operators.multimodal import audio_rms_silence


def make_wav(pcm, rate=8000, width=2, nch=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def run(spark, payloads, **kw):
    df = spark.createDataFrame(
        list(payloads.items()), "media_id long, payload binary"
    )
    return {r["media_id"]: r.asDict() for r in audio_rms_silence(df, **kw).collect()}


def test_half_silence_square_wave(spark):
    a = 2000
    pcm = np.zeros(800, dtype="<i2")
    half = np.full(400, a, dtype="<i2")
    half[1::2] = -a
    pcm[400:] = half
    got = run(spark, {1: make_wav(pcm)}, frame_ms=25, silence_threshold=1.0)[1]
    assert got["sample_rate"] == 8000 and got["n_samples"] == 800
    assert got["rms"] == math.sqrt(a * a / 2.0)
    assert (got["n_frames"], got["n_silent"], got["silence_fraction"]) == (4, 2, 0.5)


def test_all_silent_and_all_loud(spark):
    quiet = np.zeros(400, dtype="<i2")
    loud = np.full(400, 3000, dtype="<i2")
    got = run(spark, {1: make_wav(quiet), 2: make_wav(loud)}, frame_ms=25)
    assert got[1]["rms"] == 0.0 and got[1]["silence_fraction"] == 1.0
    assert got[2]["rms"] == 3000.0 and got[2]["silence_fraction"] == 0.0


def test_stereo_averages_to_mono(spark):
    # L = +1000, R = -1000 everywhere: mono average is exactly 0 => silent
    pcm = np.empty(800, dtype="<i2")
    pcm[0::2] = 1000
    pcm[1::2] = -1000
    got = run(spark, {1: make_wav(pcm, nch=2)})[1]
    assert got["n_samples"] == 400 and got["rms"] == 0.0
    assert got["silence_fraction"] == 1.0


def test_8bit_unsigned_midpoint(spark):
    # constant 128 in u8 decodes to exactly 0 after midpoint shift
    pcm = np.full(400, 128, dtype=np.uint8)
    got = run(spark, {1: make_wav(pcm, width=1)})[1]
    assert got["rms"] == 0.0


def test_partial_trailing_frame_ignored(spark):
    # 250 samples at 25ms/8kHz frames (200 samples): 1 full frame only
    pcm = np.full(250, 500, dtype="<i2")
    got = run(spark, {1: make_wav(pcm)})[1]
    assert got["n_frames"] == 1 and got["n_samples"] == 250


def test_corrupt_payload_null_row_and_strict(spark):
    got = run(spark, {1: b"not a wav"})[1]
    assert got["rms"] is None and got["sample_rate"] is None
    df = spark.createDataFrame([(1, b"nope")], "media_id long, payload binary")
    with pytest.raises(Exception):
        audio_rms_silence(df, strict=True).collect()


def test_frame_ms_guard(spark):
    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(ValueError, match="frame_ms"):
        audio_rms_silence(df, frame_ms=0)
