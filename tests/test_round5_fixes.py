"""Round-5 regressions: linear carry in the reduce walks, cdc_chunks edge
cases, bucketed-join plan gate semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pangool_spark.plans.job import _complete_group_frames, _group_starts


def _batches_from(pdf: pd.DataFrame, sizes):
    """Split a frame into consecutive batches of the given sizes."""
    out, pos = [], 0
    for s in sizes:
        out.append(pdf.iloc[pos : pos + s].reset_index(drop=True))
        pos += s
    assert pos == len(pdf)
    return out


def _random_grouped_frame(rng, n_groups, max_group, with_nulls=False):
    keys, vals = [], []
    for g in range(n_groups):
        size = int(rng.integers(1, max_group + 1))
        key = None if (with_nulls and g % 3 == 0) else f"k{g:03d}"
        keys.extend([key] * size)
        vals.extend(rng.integers(0, 1000, size).tolist())
    return pd.DataFrame({"k": keys, "v": vals})


@pytest.mark.parametrize("with_nulls", [False, True])
def test_complete_group_frames_reassembles_and_never_splits(with_nulls):
    rng = np.random.default_rng(7)
    pdf = _random_grouped_frame(rng, n_groups=23, max_group=40, with_nulls=with_nulls)
    # batch sizes chosen so several groups span multiple batches, plus an
    # empty batch in the middle
    sizes, left = [], len(pdf)
    while left > 0:
        s = min(int(rng.integers(1, 17)), left)
        sizes.append(s)
        left -= s
    sizes.insert(len(sizes) // 2, 0)

    frames = list(_complete_group_frames(_batches_from(pdf, sizes), ["k"]))

    # 1. concatenation reproduces the input exactly (order + values)
    rebuilt = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(rebuilt, pdf.reset_index(drop=True))

    # 2. no group is split across frames: each frame's first group key
    #    differs from the previous frame's last group key (null-safe)
    for prev, cur in zip(frames, frames[1:]):
        a, b = prev["k"].iloc[-1], cur["k"].iloc[0]
        assert not (a == b or (pd.isna(a) and pd.isna(b)))

    # 3. frames contain only complete groups — each frame's group count
    #    matches the distinct consecutive runs inside it
    total_groups = len(_group_starts(pdf, ["k"]))
    assert sum(len(_group_starts(f, ["k"])) for f in frames) == total_groups


def test_complete_group_frames_single_giant_group():
    """A group spanning every batch must come out as ONE frame (the
    quadratic-carry scenario: one group across B batches)."""
    pdf = pd.DataFrame({"k": ["same"] * 1000, "v": range(1000)})
    frames = list(_complete_group_frames(_batches_from(pdf, [100] * 10), ["k"]))
    assert len(frames) == 1
    pd.testing.assert_frame_equal(frames[0], pdf)


def test_complete_group_frames_multi_key_null_groups():
    pdf = pd.DataFrame(
        {
            "a": [None, None, None, "x", "x", "x", "x"],
            "b": [1, 1, 2, 2, 2, None, None],
            "v": range(7),
        }
    )
    frames = list(_complete_group_frames(_batches_from(pdf, [2, 2, 2, 1]), ["a", "b"]))
    rebuilt = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(rebuilt, pdf.reset_index(drop=True))
    # groups: (None,1) (None,2) (x,2) (x,None) → 4 complete groups
    assert sum(len(_group_starts(f, ["a", "b"])) for f in frames) == 4


# ---------------------------------------------------------------------------
# cdc_chunks edge cases


def test_cdc_min_size_holds_after_forced_cuts(spark):
    """Every chunk except the last must be >= min_size, even when a
    candidate lands just after a forced max_size cut (tight min/avg/max
    makes long gaps and close candidates common), and the chunks must
    tile the payload exactly."""
    from pangool_spark.operators.multimodal import cdc_chunks

    rng = np.random.default_rng(11)
    rows = [
        (
            "m%d" % i,
            rng.integers(0, 256, size=int(rng.integers(200, 4000)), dtype=np.uint8).tobytes(),
        )
        for i in range(20)
    ]
    sizes = {m: len(p) for m, p in rows}
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = cdc_chunks(df, min_size=64, avg_size=64, max_size=128).toPandas()
    for mid, sub in out.groupby("media_id"):
        lengths = sub.sort_values("chunk_idx")["length"].tolist()
        assert all(l >= 64 for l in lengths[:-1]), (mid, lengths)
        assert all(l <= 128 for l in lengths)
        assert sum(lengths) == sizes[mid]


def test_cdc_payload_shorter_than_gear_window(spark):
    """min_size below the 16-byte gear window + a payload between the two
    must yield a single chunk, not a ValueError."""
    from pangool_spark.operators.multimodal import cdc_chunks

    df = spark.createDataFrame(
        [("tiny", b"0123456789"), ("empty", b""), ("exact", b"0123456789abcdef")],
        "media_id string, payload binary",
    )
    out = cdc_chunks(df, min_size=4, avg_size=8, max_size=32).toPandas()
    by_id = {m: s for m, s in out.groupby("media_id")}
    assert len(by_id["tiny"]) == 1 and by_id["tiny"]["length"].iloc[0] == 10
    assert "empty" not in by_id  # empty payload emits no chunks
    assert by_id["exact"]["length"].sum() == 16


# ---------------------------------------------------------------------------
# y4m real video decode


def test_y4m_decode_frame_indexing_and_pooling():
    from pangool_spark.operators.multimodal import _y4m_decode_frame, synthesize_y4m

    frames = [np.full((8, 16), v, dtype=np.uint8) for v in (10, 20, 250)]
    clip = synthesize_y4m(frames, fps=(5, 1))  # 200 ms per frame
    for ms, want in [(0, 10.0), (199, 10.0), (200, 20.0), (450, 250.0)]:
        g = _y4m_decode_frame(clip, ms)
        assert g.shape == (8, 8) and g.dtype == np.float32
        assert float(g.mean()) == want
    with pytest.raises(ValueError, match="out of range"):
        _y4m_decode_frame(clip, 600)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        _y4m_decode_frame(b"RIFF....", 0)


def test_y4m_420_chroma_and_nonuniform_luma():
    from pangool_spark.operators.multimodal import _y4m_decode_frame, synthesize_y4m

    # gradient frame: block means differ per 8x8 cell; chroma planes must
    # be skipped when indexing frame 1
    grad = np.tile(np.arange(16, dtype=np.uint8) * 8, (8, 1))
    clip = synthesize_y4m([grad, grad[:, ::-1].copy()], fps=(2, 1), colorspace="420jpeg")
    g0 = _y4m_decode_frame(clip, 0)
    g1 = _y4m_decode_frame(clip, 500)
    # 16→8 pooling averages adjacent pairs: cell j = (2j + 2j+1)/2 * 8
    want = np.array([(2 * j + (2 * j + 1)) / 2 * 8 for j in range(8)], dtype=np.float32)
    assert np.allclose(g0[0], want)
    assert np.allclose(g1[0], want[::-1])


def test_sample_video_frames_y4m_end_to_end(spark):
    from pangool_spark.operators.multimodal import sample_video_frames, synthesize_y4m

    rows = [
        (
            int(i),
            synthesize_y4m(
                [np.full((8, 16), 7 * i + k, dtype=np.uint8) for k in range(3)],
                fps=(5, 1),
            ),
            600,
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, duration_ms long")
    out = sample_video_frames(df, every_ms=200, decoder="y4m").toPandas()
    assert len(out) == 15
    for _, r in out.iterrows():
        k = r["frame_ms"] // 200
        assert np.allclose(r["frame_feature"], 7 * r["media_id"] + k)


# ---------------------------------------------------------------------------
# end-to-end: batch-spanning groups through the real JobBuilder walks


def test_reducers_with_groups_spanning_many_arrow_batches(spark):
    """Force tiny Arrow batches so every group spans several of them; the
    per-group, vectorized, and rollup walks must all stay correct (this is
    the shape that was quadratic before round 5)."""
    import pandas as pd

    from pangool_spark.plans import JobBuilder
    from pangool_spark.plans.job import RollupReducer

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows = [(g, i) for g in ("a", "b", "c") for i in range(50)]
        df = spark.createDataFrame(rows, "k STRING, v INT").coalesce(1)

        # v1 per-group contract
        def red(key, pdf, collector):
            collector.write({"k": key[0], "total": int(pdf["v"].sum()), "n": len(pdf)})

        jb = (
            JobBuilder(spark, "span_v1")
            .add_input(df, "k:string,v:int")
            .set_group_by("k")
            .set_reducer(red, "k:string,total:long,n:long")
        )
        got = {(r.k, r.total, r.n) for r in jb.to_dataframe().collect()}
        want = {(g, sum(range(50)), 50) for g in ("a", "b", "c")}
        assert got == want

        # v2 vectorized contract
        import numpy as np

        def vred(keys, offsets, rows_):
            sums = np.add.reduceat(rows_["v"].to_numpy(), offsets[:-1])
            return pd.DataFrame(
                {"k": keys["k"], "total": sums, "n": np.diff(offsets)}
            )

        jb2 = (
            JobBuilder(spark, "span_v2")
            .add_input(df, "k:string,v:int")
            .set_group_by("k")
            .set_reducer(vred, "k:string,total:long,n:long", vectorized=True)
        )
        assert {(r.k, r.total, r.n) for r in jb2.to_dataframe().collect()} == want

        # rollup callback walk: per-group subtotals must see ALL rows of a
        # spanning group exactly once
        seen = []

        class Rollup(RollupReducer):
            def on_group_elements(self, group, rows_, collector):
                collector.write(
                    {"k": group["k"], "total": int(rows_["v"].sum()), "n": len(rows_)}
                )

        jb3 = (
            JobBuilder(spark, "span_rollup")
            .add_input(df, "k:string,v:int")
            .set_group_by("k")
            .set_rollup_from("k")
            .set_rollup_reducer(Rollup(), "k:string,total:long,n:long")
        )
        assert {(r.k, r.total, r.n) for r in jb3.to_dataframe().collect()} == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
