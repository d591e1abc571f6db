"""Releasable localCheckpoint (operators/ckpt.py): the helper must
actually free checkpoint blocks — DataFrame.unpersist() does NOT (the
round-12 finding that OOM'd the suffix tier's 100x probe at an 80 GiB
heap), so these tests pin the real mechanism."""

from __future__ import annotations

from hive_population_ml_spark.operators.ckpt import free_ckpt, local_ckpt


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_plain_unpersist_is_a_noop_for_checkpoints(spark):
    """The failure mode the helper exists for: if this ever starts
    passing with plain unpersist, the helper can be simplified."""
    base = _n_persistent(spark)
    df = spark.range(100).localCheckpoint()
    assert _n_persistent(spark) == base + 1
    df.unpersist(blocking=True)
    assert _n_persistent(spark) == base + 1  # still pinned!
    free_ckpt(local_ckpt(spark.range(1)))  # cleanliness for next tests
    spark.sparkContext._jsc.getPersistentRDDs()


def test_local_ckpt_free_releases_blocks(spark):
    base = _n_persistent(spark)
    df = local_ckpt(spark.range(1000))
    assert _n_persistent(spark) == base + 1
    assert df.count() == 1000  # blocks are readable
    free_ckpt(df)
    assert _n_persistent(spark) == base
    free_ckpt(df)  # idempotent, no error
    free_ckpt(spark.range(1))  # non-checkpointed: no-op


def test_iterative_loop_keeps_bounded_state(spark):
    """The loop pattern: after each round only the CURRENT checkpoint
    (plus whatever was pinned before) remains persistent."""
    base = _n_persistent(spark)
    r = local_ckpt(spark.range(100))
    for _ in range(5):
        nxt = local_ckpt(r.selectExpr("id + 1 as id"))
        free_ckpt(r)
        r = nxt
        assert _n_persistent(spark) == base + 1
    assert r.agg({"id": "min"}).first()[0] == 5
    free_ckpt(r)
    assert _n_persistent(spark) == base


def test_suffix_ranks_do_not_accumulate_checkpoints(spark):
    """End-to-end: the prefix-doubling loop holds at most a constant
    number of persistent rank tables regardless of round count."""
    from hive_population_ml_spark.operators.suffixes import (
        corpus_char_table,
        suffix_ranks,
    )

    base = _n_persistent(spark)
    docs = spark.createDataFrame(
        [(i, "abracadabra" * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    chars = corpus_char_table(docs, "doc_id", "text")
    ranks, prefix = suffix_ranks(chars)
    assert ranks.count() > 0 and prefix >= 1
    # corpus_char_table pins 1 meta table, global_rank pins 1 per call
    # on the FINAL round, plus the final rank table — the point is the
    # bound does not grow with the ~6 doubling rounds this corpus needs
    assert _n_persistent(spark) - base <= 4
