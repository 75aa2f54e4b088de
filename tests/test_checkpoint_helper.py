"""data.checkpoint_eager: reliable-checkpoint fallback contract.

The materialize-once discipline (52 localCheckpoint sites) truncates
lineage, so an executor loss after the checkpoint kills the job instead
of recomputing. checkpoint_eager gives the O(corpus) sites a durable
path: reliable checkpoint() when the application configured a checkpoint
dir, localCheckpoint otherwise — bit-identical rows either way.

``df.rdd`` wraps the checkpointed internals in a fresh MapPartitionsRDD
(javaToPython), so the isCheckpointed flags are not visible from Python;
the observable contracts asserted here are (a) lineage truncation — the
analyzed plan becomes a LogicalRDD scan — and (b) whether files landed
in the configured checkpoint directory.
"""

import os

from pyspark.sql import functions as F


def _fresh(spark):
    return spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))


def _is_truncated(df) -> bool:
    return (
        df._jdf.queryExecution().analyzed().getClass().getSimpleName()
        == "LogicalRDD"
    )


def _tree_files(root: str) -> int:
    return sum(len(fs) for _, _, fs in os.walk(root))


def _clear_dir(spark):
    getattr(spark.sparkContext._jsc.sc(), "checkpointDir_$eq")(
        spark.sparkContext._jvm.scala.Option.apply(None)
    )


def test_local_without_checkpoint_dir(spark):
    from pangool_spark.data import checkpoint_eager

    # no checkpoint dir configured in the test session by default
    assert spark.sparkContext.getCheckpointDir() is None
    out = checkpoint_eager(_fresh(spark), reliable_ok=True)
    assert _is_truncated(out)
    assert out.count() == 100


def test_reliable_when_dir_configured(spark, tmp_path):
    from pangool_spark.data import checkpoint_eager

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        out = checkpoint_eager(_fresh(spark), reliable_ok=True)
        assert _is_truncated(out)
        # reliable checkpoints are materialized to the configured dir
        assert _tree_files(ckpt) > 0
        assert sorted(r.v for r in out.collect()) == [2 * i for i in range(100)]

        # proxy-sized sites (default reliable_ok=False) stay local even
        # with a dir configured — no distributed round trip for 16 B rows
        n_before = _tree_files(ckpt)
        out2 = checkpoint_eager(_fresh(spark))
        assert _is_truncated(out2)
        assert out2.count() == 100
        assert _tree_files(ckpt) == n_before
    finally:
        _clear_dir(spark)


def test_bpe_token_ids_unchanged_under_reliable_path(spark, tmp_path):
    # the O(corpus) consumer: same token ids with and without the
    # reliable path
    from pangool_spark.operators.text import bpe_token_ids

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog sat")],
        "doc_id LONG, text STRING",
    )
    merges = [("a", "t"), ("c", "at")]
    before = {
        (r.doc_id, r.pos, r.token_id)
        for r in bpe_token_ids(docs, merges).collect()
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    try:
        after = {
            (r.doc_id, r.pos, r.token_id)
            for r in bpe_token_ids(docs, merges).collect()
        }
    finally:
        _clear_dir(spark)
    assert before == after
