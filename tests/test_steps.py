"""Unit tests for the Step algebra vs pandas reference semantics
(SURVEY §2.1: selector × op × rename × output mode)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_transformation_2022_spark.operators.steps import (
    RID,
    Step,
    apply_step,
    apply_tpath,
    step_from_dict,
)


@pytest.fixture(scope="module")
def df(spark):
    pdf = pd.DataFrame(
        {
            "a": [1, 2, 3, 4],
            "b": [10.0, 0.0, 30.0, 20.0],
            "c": ["x", "y", "x", "z"],
            "d": [2.0, 4.0, 4.0, 8.0],
        }
    )
    pdf[RID] = range(len(pdf))
    return spark.createDataFrame(pdf)


def rows(sdf, order=RID):
    return [r.asDict() for r in sdf.orderBy(order).collect()]


def test_selector_like_numeric(df):
    out = apply_step(df, Step(t="select", i_type="like", i=["int", "float"]))
    assert set(out.columns) == {RID, "a", "b", "d"}


def test_selector_eq_and_rename(df):
    out = apply_step(df, Step(t="select", i_type="==", i=["a", "c"], index=["a2", "c2"]))
    assert set(out.columns) == {RID, "a2", "c2"}


def test_astype(df):
    out = apply_step(df, Step(t="astype", i_type="==", i=["a"], args=["float"], o_type="new_table"))
    assert dict(out.dtypes)["a"] == "double"


def test_hsum_is_horizontal(df):
    out = apply_step(df, Step(t="sum", i_type="==", i=["b", "d"], index=["s"], o_type="append"))
    got = [r["s"] for r in rows(out)]
    assert got == [12.0, 4.0, 34.0, 28.0]


def test_hmul(df):
    out = apply_step(df, Step(t="mul", i_type="==", i=["a", "d"], index=["m"], o_type="append"))
    assert [r["m"] for r in rows(out)] == [2.0, 8.0, 12.0, 32.0]


def test_sub(df):
    out = apply_step(df, Step(t="sub", i_type="==", i=["b", "d"], index=["s"], o_type="new_table"))
    assert [r["s"] for r in rows(out)] == [8.0, -4.0, 26.0, 12.0]


def test_div_nan_to_zero(df):
    # pandas: b/a then fillna(0); div-by-zero → 0 (reference Tengine.py:104)
    out = apply_step(df, Step(t="div", i_type="==", i=["d", "b"], index=["q"], o_type="new_table"))
    assert [r["q"] for r in rows(out)] == [0.2, 0.0, 4.0 / 30.0, 0.4]


def test_rank_method_first(df):
    # pandas rank(method="first") on d: [1, 2, 3, 4] for values [2,4,4,8]
    out = apply_step(df, Step(t="rank", i_type="==", i=["d"], index=["r"], o_type="append"))
    pdf = pd.DataFrame({"d": [2.0, 4.0, 4.0, 8.0]})
    expected = pdf["d"].rank(method="first").astype(int).tolist()
    assert [r["r"] for r in rows(out)] == expected


def test_nominalize_sorted_codes(df):
    out = apply_step(df, Step(t="nominalize", i_type="==", i=["c"], index=["code"], o_type="append"))
    # np.unique(["x","y","x","z"]) → ["x","y","z"] → codes [0,1,0,2]
    assert [r["code"] for r in rows(out)] == [0, 1, 0, 2]


def test_output_mode_replace_drops_inputs(df):
    out = apply_step(df, Step(t="sum", i_type="==", i=["b", "d"], index=["s"], o_type="replace"))
    assert "b" not in out.columns and "d" not in out.columns and "s" in out.columns
    assert "a" in out.columns


def test_tpath_fold_and_serialization(df):
    steps = [
        Step(t="sum", i_type="==", i=["b", "d"], index=["s"], o_type="append"),
        Step(t="rank", i_type="==", i=["s"], index=["rs"], o_type="append"),
        Step(t="select", i_type="==", i=["a", "s", "rs"], o_type="new_table"),
    ]
    out1 = apply_tpath(df, steps)
    out2 = apply_tpath(df, [step_from_dict(s.to_dict()) for s in steps])
    assert rows(out1) == rows(out2)
    assert set(out1.columns) == {RID, "a", "s", "rs"}


def test_stacked_rank_refuses_bigint_mix(spark):
    """A heterogeneous mix containing bigint must NOT be unified through
    double (values above 2^53 collapse); the stacked form declines and
    the per-column native-type path ranks them distinctly."""
    from data_transformation_2022_spark.operators.steps import _apply_rank_stacked

    big = 2**53
    pdf = pd.DataFrame(
        {
            RID: [0, 1, 2],
            "h": np.array([big + 1, big + 2, big + 3], dtype=np.int64),
            "i": np.array([3, 1, 2], dtype=np.int32),
        }
    )
    df = spark.createDataFrame(pdf)
    step = Step(t="rank", i_type="==", i=["h", "i"], index=["rh", "ri"], o_type="new_table")
    assert _apply_rank_stacked(df, step, ["h", "i"]) is None
    out = apply_step(df, step)
    got = {r[RID]: (r["rh"], r["ri"]) for r in rows(out)}
    assert got == {0: (1, 3), 1: (2, 1), 2: (3, 2)}


def test_horizontal_fold_wide_ints_no_overflow(spark):
    """Overflow policy pin: all-integral horizontal sum/mul folds in
    DECIMAL(38,0) — a sum/product that overflows int64 keeps its exact
    magnitude instead of wrapping (reference numpy) or throwing
    mid-plan (Spark ANSI)."""
    from decimal import Decimal

    from data_transformation_2022_spark.operators.steps import Step, apply_tpath

    big = 4_000_000_000  # 4e9: pairwise product overflows int64
    df = spark.createDataFrame(
        [(big, big, big)], "a bigint, b bigint, c bigint"
    )
    s = apply_tpath(df, [Step(t="sum", i_type="all", i=None)]).collect()[0][0]
    assert s == Decimal(3 * big)
    m = apply_tpath(df, [Step(t="mul", i_type="all", i=None)]).collect()[0][0]
    assert m == Decimal(big) ** 3  # 6.4e28 — far past int64, exact in decimal


def test_horizontal_mul_decimal_overflow_raises(spark):
    """A product that exceeds DECIMAL(38,0)'s 38 digits must FAIL
    VISIBLY, not silently yield NULL (Spark's default non-ANSI decimal
    overflow behavior): the fold wraps in an explicit null-after-fold
    check that raises. NULL inputs still propagate as NULL (no raise)."""
    import pytest

    from data_transformation_2022_spark.operators.steps import Step, apply_tpath

    big = 10**13  # (1e13)^3 = 1e39 > 38 digits
    df = spark.createDataFrame([(big, big, big)], "a bigint, b bigint, c bigint")
    # Under ANSI (this session's default) the decimal mul itself throws
    # NUMERIC_VALUE_OUT_OF_RANGE; the explicit guard exists for non-ANSI
    # sessions where the mul would silently yield NULL instead.
    with pytest.raises(Exception, match="overflow|NUMERIC_VALUE_OUT_OF_RANGE"):
        apply_tpath(df, [Step(t="mul", i_type="all", i=None)]).collect()
    ansi_key = "spark.sql.ansi.enabled"
    ansi_before = spark.conf.get(ansi_key)
    try:
        spark.conf.set(ansi_key, "false")
        with pytest.raises(Exception, match="overflow"):
            apply_tpath(df, [Step(t="mul", i_type="all", i=None)]).collect()
        # NULL input → NULL output, no raise (null propagation, not overflow)
        dfn = spark.createDataFrame(
            [(big, None, big)], "a bigint, b bigint, c bigint"
        )
        out = apply_tpath(dfn, [Step(t="mul", i_type="all", i=None)]).collect()
        assert out[0][0] is None
    finally:
        spark.conf.set(ansi_key, ansi_before)


def test_horizontal_sum_floats_keeps_double(spark):
    """Float inputs keep IEEE double arithmetic (oracle-exact path)."""
    from data_transformation_2022_spark.operators.steps import Step, apply_tpath

    df = spark.createDataFrame([(1.5, 2.25)], "a double, b double")
    out = apply_tpath(df, [Step(t="sum", i_type="all", i=None)])
    assert dict(out.dtypes).popitem()[1] == "double"
    assert out.collect()[0][0] == 3.75
