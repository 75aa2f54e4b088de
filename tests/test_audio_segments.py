"""audio_voiced_segments: VAD-style run-length segmentation."""

import io
import wave

import numpy as np
import pytest


def _wav(pcm: np.ndarray, rate: int = 8000, width: int = 2, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _segments(spark, payloads, **kw):
    from pangool_spark.operators.multimodal import audio_voiced_segments

    df = spark.createDataFrame(
        list(payloads.items()), "media_id LONG, payload BINARY"
    )
    out = audio_voiced_segments(df, **kw)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["media_id"], []).append(
            (r["segment_idx"], r["start_frame"], r["n_frames"])
        )
    return {k: sorted(v) for k, v in got.items()}


def test_segments_recover_bit_runs(spark):
    # frames: V V S V S S V V  -> segments (0,2), (3,1), (6,2)
    blk = np.full(200, 500, dtype="<i2")
    blk[1::2] = -500
    pcm = np.zeros(8 * 200, dtype="<i2")
    for f in [0, 1, 3, 6, 7]:
        pcm[f * 200 : (f + 1) * 200] = blk
    got = _segments(spark, {1: _wav(pcm)}, frame_ms=25, silence_threshold=1.0)
    assert got == {1: [(0, 0, 2), (1, 3, 1), (2, 6, 2)]}


def test_fully_silent_absent_and_corrupt_null(spark):
    silent = _wav(np.zeros(800, dtype="<i2"))
    got = _segments(
        spark,
        {1: silent, 2: b"not a wav"},
        frame_ms=25,
        silence_threshold=1.0,
    )
    assert 1 not in got
    assert got[2] == [(None, None, None)]


def test_strict_reraises(spark):
    from pangool_spark.operators.multimodal import audio_voiced_segments

    df = spark.createDataFrame(
        [(1, b"garbage")], "media_id LONG, payload BINARY"
    )
    with pytest.raises(Exception):
        audio_voiced_segments(df, strict=True).collect()


def test_stereo_averages_and_trailing_partial_ignored(spark):
    # stereo: L channel loud, R silent -> mono mean still voiced;
    # 2.5 frames of samples -> trailing half frame ignored
    n = 500  # 2.5 frames at 200 samples/frame
    left = np.full(n, 800, dtype="<i2")
    left[1::2] = -800
    inter = np.zeros(2 * n, dtype="<i2")
    inter[0::2] = left
    got = _segments(
        spark, {1: _wav(inter, nch=2)}, frame_ms=25, silence_threshold=1.0
    )
    assert got == {1: [(0, 0, 2)]}
