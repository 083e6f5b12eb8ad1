"""force_count (functions/consume.py): the bench harness's
prune-proof result consumption. Pins (1) row-count equivalence with
count() across output type shapes, and (2) that the forced plan
actually evaluates pruned-away expressions — the r15 finding was that
count() benched 19M cosine folds as a parquet row count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.functions.consume import force_count


def test_force_count_matches_count_across_type_shapes(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    # map output, per-doc projection, binary/struct metadata, aggregate
    for name in (
        "map_funcs",
        "classifier_score",
        "mm_metadata",
        "token_fertility",
    ):
        df = qs[name](spark, sf_dir)
        assert force_count(df) == df.count(), name


def test_force_count_actually_evaluates_projected_expressions(spark):
    """A projection whose expression FAILS on evaluation is silently
    pruned by count() — the measurement lie — but must blow up under
    force_count, proving the forced plan runs the expression. Exactly
    ONE failing column: with several, parallel tasks race and whichever
    partition fails first decides the reported error, so the match was
    flaky (an ANSI divide-by-zero on id=0 could beat raise_error)."""
    from py4j.protocol import Py4JJavaError

    df = spark.range(10).select(
        (F.col("id") * 2).alias("z"),
        F.expr("raise_error('evaluated')").alias("boom"),
    )
    # count() prunes both columns and succeeds: the lie this helper
    # exists to fix
    assert df.count() == 10
    with pytest.raises((Py4JJavaError, Exception), match="evaluated"):
        force_count(df)
