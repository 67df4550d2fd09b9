"""Validation suite on deliberately broken data: each check counts
exactly its own violations."""

from __future__ import annotations

from ravelytics_spark.operators import validation as V


def test_validation_counts_violations(spark):
    rows = [
        (1, 10.0, 0.05, "A"),
        (2, None, 0.05, "N"),      # null quantity
        (3, 5.0, 1.5, "R"),        # discount out of range
        (4, 5.0, 0.1, "X"),        # bad domain
        (4, 5.0, 0.1, "A"),        # duplicate key
    ]
    df = spark.createDataFrame(rows, ["id", "qty", "disc", "flag"])
    report = {
        r.check: r.violations
        for r in V.validate(
            df,
            [V.not_null("qty"), V.in_range("disc", 0, 1), V.in_set("flag", ["A", "N", "R"])],
        ).collect()
    }
    assert report == {"not_null_qty": 1, "range_disc": 1, "domain_flag": 1}

    uniq = V.check_unique(df, ["id"]).collect()[0]
    assert uniq.violations == 1 and uniq.total == 5

    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pid"])
    fk = V.check_referential(df, parent, fk="id", pk="pid").collect()[0]
    assert fk.violations == 2  # both id=4 rows are orphans


def test_in_range_counts_null_as_violation(spark):
    df = spark.createDataFrame([(None,), (0.5,)], ["x"])
    report = V.validate(df, [V.in_range("x", 0, 1)]).collect()[0]
    assert report.violations == 1  # null BETWEEN → null → counted as violating
