"""Round-6 advice fixes: dedup cache lifecycle, streaming broadcast
opt-out."""

import pytest
from pyspark.sql import functions as F


def test_dedup_release_caches_evicts_batch_intermediates(spark):
    """ngram_jaccard_against caches its shingle intermediates; in the
    daily-ingest loop those must be evictable between batches or storage
    memory grows without bound across the session."""
    from pangool_spark.operators import dedup

    dedup.release_caches()  # clean slate
    new_df = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], "doc_id LONG, text STRING"
    )
    ref_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon eta")], "doc_id LONG, text STRING"
    )
    out = dedup.ngram_jaccard_against(new_df, ref_df, threshold=0.3)
    out.count()  # materialize THROUGH the caches first
    cached = [df for dfs in dedup._ACTIVE_CACHES.values() for df in dfs]
    assert len(cached) >= 2
    released = dedup.release_caches()
    assert released == len(cached)
    assert dedup._ACTIVE_CACHES == {}
    for df in cached:
        level = df.storageLevel
        assert not (level.useMemory or level.useDisk)


def test_clear_shingle_cache_releases_dedup_caches(spark):
    from pangool_spark.operators import dedup
    from pangool_spark.queries import clear_shingle_cache

    dedup.release_caches()
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id LONG, text STRING")
    dedup.ngram_jaccard_pairs(df, threshold=0.9).count()
    assert sum(len(v) for v in dedup._ACTIVE_CACHES.values()) >= 1
    assert clear_shingle_cache(spark) >= 1
    assert dedup._ACTIVE_CACHES == {}


def test_persisted_index_lifecycle_across_sessions(spark, tmp_path):
    """The standing index must round-trip through DISK and a genuinely
    fresh session: batch 2 is deduped by an index that includes batch-1
    admissions, read back with no lineage to the corpus DataFrames."""
    from pangool_spark.operators.dedup import incremental_dedup, shingles
    from pangool_spark.operators.norm import content_digest
    from pangool_spark.sources.tuplefile import read_tuples, write_tuples

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id LONG, text STRING",
    )
    dg, sh = str(tmp_path / "dg"), str(tmp_path / "sh")
    write_tuples(
        corpus.select(content_digest("text").alias("__digest__")).distinct(), dg
    )
    write_tuples(shingles(corpus, hashed=True), sh)

    batch1 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta iota"),  # ≈ corpus 1
            (11, "one two three four five six seven eight nine"),  # novel
        ],
        "doc_id LONG, text STRING",
    )
    adm1 = incremental_dedup(
        batch1, None, threshold=0.5,
        seen_digests=read_tuples(spark, dg), ref_shingles=read_tuples(spark, sh),
    )
    write_tuples(adm1, str(tmp_path / "adm1"))
    adm1_disk = read_tuples(spark, str(tmp_path / "adm1"))
    assert [r.doc_id for r in adm1_disk.collect()] == [11]
    write_tuples(
        adm1_disk.select(content_digest("text").alias("__digest__")).distinct(),
        dg, mode="append",
    )
    write_tuples(shingles(adm1_disk, hashed=True), sh, mode="append")

    # fresh session: same JVM, clean catalog/state — the index state comes
    # ONLY from the files
    fresh = spark.newSession()
    batch2 = fresh.createDataFrame(
        [
            (20, "one two three four five six seven eight ten"),  # ≈ adm1 11
            (21, "alpha beta gamma delta epsilon zeta eta kappa"),  # ≈ corpus 1
            (22, "totally novel content nothing matches this row"),
        ],
        "doc_id LONG, text STRING",
    )
    adm2 = incremental_dedup(
        batch2, None, threshold=0.5,
        seen_digests=read_tuples(fresh, dg), ref_shingles=read_tuples(fresh, sh),
    )
    assert sorted(r.doc_id for r in adm2.collect()) == [22]

    with pytest.raises(ValueError, match="persisted-index"):
        incremental_dedup(batch2, None, seen_digests=read_tuples(fresh, dg))


def test_dataset_checksum_order_and_partition_invariant(spark):
    from pangool_spark.operators.profile import dataset_checksum

    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, None), (1, "a")], "k LONG, v STRING"
    )
    base = dataset_checksum(df).collect()[0]
    assert base.n_rows == 4
    # same multiset, different order/partitioning -> identical checksum
    shuffled = df.orderBy(F.desc("k")).repartition(7)
    again = dataset_checksum(shuffled).collect()[0]
    assert (again.n_rows, again.checksum) == (base.n_rows, base.checksum)
    # any row change -> different checksum (duplicate multiplicity counts)
    changed = dataset_checksum(df.limit(3)).collect()[0]
    assert changed.checksum != base.checksum
    # column subset and explicit order
    sub = dataset_checksum(df, ["k"]).collect()[0]
    assert sub.checksum != base.checksum
    with pytest.raises(ValueError, match="at least one"):
        dataset_checksum(df, [])


def test_exact_dedup_by_quality_survivors(spark):
    from pangool_spark.operators.dedup import exact_dedup_by

    rows = [
        (1, "same text", 0.5),
        (2, "same text", 0.9),    # highest score wins
        (3, "same text", None),   # unscored loses to any scored copy
        (10, "other text", 0.7),
        (11, "other text", 0.7),  # tie -> min id
        (20, "only copy", None),  # all-null group -> min id
        (21, "only copy", None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, score DOUBLE")
    got = sorted(r.doc_id for r in exact_dedup_by(df, "score").collect())
    assert got == [2, 10, 20]
    with pytest.raises(ValueError, match="numeric id"):
        exact_dedup_by(
            df.withColumn("doc_id", F.col("doc_id").cast("string")), "score"
        )


def test_expectations_one_pass_and_null_handling(spark):
    from pangool_spark.operators.profile import expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id LONG, x DOUBLE"
    )
    out = expectations(
        df, {"x_positive": "x > 0", "id_small": "id <= 2"}
    )
    got = {r.constraint_name: (r.n_rows, r.n_violations) for r in out.collect()}
    # NULL predicate (x > 0 on row 2) counts as a violation
    assert got == {"x_positive": (3, 2), "id_small": (3, 1)}
    pf = {r.constraint_name: r.pass_fraction for r in out.collect()}
    assert abs(pf["x_positive"] - 1 / 3) < 1e-12
    # N constraints must cost ONE scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
    with pytest.raises(ValueError, match="at least one"):
        expectations(df, {})


def test_funnel_modes_agree_on_null_timestamps(spark):
    """Null-ts events are ignored in BOTH modes — without the explicit
    filter the fold would sort them first (matchable) while stepwise's
    min-chain never matches them."""
    from pangool_spark.operators.funnel import funnel

    ev = spark.createDataFrame(
        [(1, None, "view"), (1, 5, "click"), (2, None, "view"), (2, 3, "view")],
        "user_id LONG, ts LONG, event_type STRING",
    )
    for mode in ("stepwise", "fold"):
        got = {
            r.user_id: r.steps_completed
            for r in funnel(ev, ["view", "click"], mode=mode).collect()
        }
        # user 1: only a null-ts view -> the click can't open the funnel
        # (depth 0); user 2: real view at ts 3 -> depth 1
        assert got == {1: 0, 2: 1}, mode


def test_funnel_checkpoint_levels_equals_lazy(spark):
    from pangool_spark.data import load_table
    from pangool_spark.operators.funnel import funnel

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    steps = ["view", "click", "purchase"]
    lazy = {
        r.user_id: r.steps_completed for r in funnel(ev, steps).collect()
    }
    ckpt = {
        r.user_id: r.steps_completed
        for r in funnel(ev, steps, checkpoint_levels=True).collect()
    }
    assert lazy == ckpt and len(lazy) > 0


def test_mixture_sample_hits_target_proportions(spark):
    from pangool_spark.operators.sampling import mixture_sample

    rows = [(i, "en") for i in range(800)] + [(i, "de") for i in range(800, 1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    out = mixture_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.5}).collect()
    got = {"en": 0, "de": 0}
    for r in out:
        got[r.lang] += 1
    # de binds (200/0.5=400 < 800/0.5): de keeps everything, en samples ~200
    assert got["de"] == 200
    assert abs(got["en"] - 200) < 40  # hash-uniformity tolerance
    # deterministic: same call, same members
    again = mixture_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.5}).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)
    # unweighted strata drop; weighted-but-absent strata raise
    df2 = df.withColumn("lang", F.when(F.col("doc_id") < 10, "fr").otherwise(F.col("lang")))
    assert mixture_sample(df2, "doc_id", "lang", {"en": 1.0}).filter("lang <> 'en'").count() == 0
    with pytest.raises(ValueError, match="no rows"):
        mixture_sample(df, "doc_id", "lang", {"en": 0.5, "xx": 0.5})


def test_group_sample_quota_and_plan(spark):
    from pangool_spark.operators.sampling import group_sample

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "id LONG, g STRING")
    out = group_sample(df, "id", "g", k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.g, []).append(r.id)
    assert len(got["big"]) == 5 and sorted(got["small"]) == [1000, 1001, 1002]
    # deterministic selection
    again = group_sample(df, "id", "g", k=5).collect()
    assert sorted((r.g, r.id) for r in again) == sorted(
        (g, i) for g, ids in got.items() for i in ids
    )
    # the rank<=k predicate must push into WindowGroupLimit (per-task
    # k-row heaps; full groups never materialize)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    with pytest.raises(ValueError, match="positive"):
        group_sample(df, "id", "g", k=0)


def test_quantile_filter_exact_thresholds(spark):
    from pangool_spark.operators.sampling import quantile_filter

    rows = [(i, "a", float(i)) for i in range(1, 6)] + [
        (i, "b", float(i * 10)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "id LONG, g STRING, v DOUBLE")
    # group a: values 1..5, p75 = 4.0 -> keep 4,5; group b: 10..40, p75 = 32.5 -> keep 40
    up = sorted((r.g, r.id) for r in quantile_filter(df, "v", 0.75, group_col="g").collect())
    assert up == [("a", 4), ("a", 5), ("b", 4)]
    lo = quantile_filter(df, "v", 0.25, group_col="g", keep="lower")
    assert sorted((r.g, r.id) for r in lo.collect()) == [("a", 1), ("a", 2), ("b", 1)]
    # ungrouped: global p50 of 1,2,3,4,5,10,20,30,40 = 5.0
    glob = quantile_filter(df, "v", 0.5)
    assert sorted(r.v for r in glob.collect()) == [5.0, 10.0, 20.0, 30.0, 40.0]
    # NULL quality values never survive the cut (and don't shift the
    # percentile, which ignores them)
    with_null = df.unionByName(
        spark.createDataFrame([(99, "a", None)], "id LONG, g STRING, v DOUBLE")
    )
    up2 = sorted(
        (r.g, r.id) for r in quantile_filter(with_null, "v", 0.75, group_col="g").collect()
    )
    assert up2 == [("a", 4), ("a", 5), ("b", 4)]


def test_detect_scene_cuts_finds_shot_boundary(spark):
    import numpy as np

    from pangool_spark.operators.multimodal import detect_scene_cuts, synthesize_y4m

    clip = synthesize_y4m(
        [np.full((8, 8), v, dtype=np.uint8) for v in (50, 50, 200, 200, 55)],
        fps=(5, 1),
    )
    df = spark.createDataFrame(
        [(1, bytearray(clip)), (2, bytearray(b"not a video"))],
        "media_id LONG, payload BINARY",
    )
    rows = detect_scene_cuts(df, threshold=24.0).collect()
    good = {r.frame_idx: (r.mean_abs_diff, r.is_cut) for r in rows if r.media_id == 1}
    # cuts at the 50->200 jump (150) and the 200->55 jump (145); the 5-step
    # fade at the end stays under threshold
    assert good == {
        1: (0.0, False), 2: (150.0, True), 3: (0.0, False), 4: (145.0, True)
    }
    bad = [r for r in rows if r.media_id == 2]
    assert len(bad) == 1 and bad[0].frame_idx is None and bad[0].is_cut is None
    with pytest.raises(Exception):
        detect_scene_cuts(df, strict=True).collect()


def test_audio_dominant_freq_pure_tone_and_stereo(spark):
    import io
    import wave

    import numpy as np

    from pangool_spark.operators.multimodal import audio_dominant_freq

    def wav(pcm, nch=1, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.astype("<i2").tobytes())
        return bytearray(buf.getvalue())

    t = np.arange(1600) / 8000.0
    mono = np.round(8000 * np.sin(2 * np.pi * 440 * t))  # 440 Hz on-bin (5 Hz bins)
    # stereo: both channels carry 100 Hz; interleaved
    st = np.round(8000 * np.sin(2 * np.pi * 100 * t))
    stereo = np.column_stack([st, st]).ravel()
    df = spark.createDataFrame(
        [(1, wav(mono)), (2, wav(stereo, nch=2)), (3, bytearray(b"xx"))],
        "media_id LONG, payload BINARY",
    )
    got = {r.media_id: (r.sample_rate, r.n_samples, r.dominant_hz)
           for r in audio_dominant_freq(df).collect()}
    assert got[1] == (8000, 1600, 440.0)
    assert got[2] == (8000, 1600, 100.0)
    assert got[3] == (None, None, None)


def test_sample_video_frames_ffmpeg_matches_y4m(spark):
    """ffmpeg-path integration: feed a synthetic uncompressed Y4M clip
    (a container ffmpeg reads natively) through decoder='ffmpeg' and check
    the 8x8 features agree with the pure-numpy y4m decoder. Skips cleanly
    where ffmpeg isn't installed — the codec seam stays honest either way."""
    import numpy as np

    from pangool_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_y4m,
        video_codec_available,
    )

    if not video_codec_available():
        pytest.skip("ffmpeg not on PATH")
    frames = [np.full((16, 16), v, dtype=np.uint8) for v in (40, 120, 200)]
    clip = synthesize_y4m(frames, fps=(5, 1), colorspace="420jpeg")  # 200ms/frame
    df = spark.createDataFrame(
        [(1, bytearray(clip), 600)], "media_id LONG, payload BINARY, duration_ms LONG"
    )
    by = {}
    for dec in ("ffmpeg", "y4m"):
        out = sample_video_frames(df, every_ms=200, decoder=dec).toPandas()
        by[dec] = {
            int(r.frame_ms): np.array(r.frame_feature, dtype=np.float32).mean()
            for r in out.itertuples()
        }
    assert set(by["ffmpeg"]) == set(by["y4m"]) == {0, 200, 400}
    for ms, want in zip((0, 200, 400), (40, 120, 200)):
        assert abs(by["y4m"][ms] - want) < 2
        assert abs(by["ffmpeg"][ms] - by["y4m"][ms]) < 3, ms


def test_stream_dedup_against_shuffle_fallback_parity(spark):
    """broadcast=False must return the identical survivor set via a
    shuffled anti-join — the fallback for digest sets too big to
    broadcast (billions of rows at a 100 TB standing corpus)."""
    from pangool_spark.streaming.ops import stream_dedup_against

    corpus = spark.createDataFrame(
        [(1, "seen text one"), (2, "seen text two")], "doc_id LONG, text STRING"
    )
    batch = spark.createDataFrame(
        [(10, "Seen   text ONE"), (11, "genuinely new"), (12, "seen text two")],
        "doc_id LONG, text STRING",
    )
    expect = [11]
    for bc in (True, False):
        got = sorted(
            r.doc_id for r in stream_dedup_against(batch, corpus, broadcast=bc).collect()
        )
        assert got == expect, f"broadcast={bc}"
