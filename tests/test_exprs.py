"""Expression-compiler semantics vs the reference's inline goldens
(``/root/reference/src/execution/expression_execution.rs:684-1286``).
Pure pyarrow — no Ray."""

import datetime as dt

import pyarrow as pa
import pytest

from sqlgrep_ray.functions.exprs import (
    Bin,
    Case,
    Cast,
    Col,
    CompileCtx,
    Func,
    Index,
    InList,
    Lit,
    Un,
    compile_expr,
    compile_predicate,
)
from sqlgrep_ray.schema import FLOAT, INT, STRING


def ev(expr, table, ctx=None):
    out = compile_expr(expr, ctx)(table)
    if isinstance(out, pa.Scalar):
        return out.as_py()
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out.to_pylist()


T = pa.table(
    {
        "i": pa.array([1, 2, None], pa.int64()),
        "f": pa.array([1.5, -2.0, None], pa.float64()),
        "s": pa.array(["abc", "XYZ", None], pa.string()),
        "b": pa.array([True, False, None], pa.bool_()),
        "arr": pa.array([[10, 20], [30], None], pa.list_(pa.int64())),
        "ts": pa.array(
            [dt.datetime(2005, 6, 17, 7, 30, 5), dt.datetime(2020, 1, 1), None],
            pa.timestamp("us"),
        ),
    }
)


def test_null_compare_is_false():
    # expression_execution.rs:46-72 — NULL operand ⇒ false, not NULL
    assert ev(Bin("eq", Col("i"), Lit(1)), T) == [True, False, False]
    assert ev(Bin("gt", Col("i"), Lit(0)), T) == [True, True, False]


def test_is_and_is_not_null_safe():
    assert ev(Bin("is", Col("i"), Lit(None, INT)), T) == [False, False, True]
    assert ev(Bin("is_not", Col("i"), Lit(None, INT)), T) == [True, True, False]
    assert ev(Bin("is", Col("i"), Lit(2)), T) == [False, True, False]


def test_int_division_truncates():
    t = pa.table({"x": pa.array([7, -7, 9], pa.int64())})
    assert ev(Bin("div", Col("x"), Lit(2)), t) == [3, -3, 4]


def test_arith_and_unary():
    assert ev(Bin("add", Col("i"), Lit(10)), T) == [11, 12, None]
    assert ev(Un("neg", Col("f")), T) == [-1.5, 2.0, None]
    assert ev(Un("not", Col("b")), T) == [False, True, None]


def test_and_or_coerce_null_to_false():
    # model.rs:163-168 — .bool() of NULL ⇒ false
    assert ev(Bin("and", Col("b"), Lit(True)), T) == [True, False, False]
    assert ev(Bin("or", Col("b"), Lit(False)), T) == [True, False, False]


def test_in_list():
    assert ev(InList(Col("i"), (Lit(1), Lit(3))), T) == [True, False, False]
    assert ev(InList(Col("i"), (Lit(1),), negated=True), T) == [False, True, True]


def test_case_first_true_wins():
    e = Case(
        whens=(
            (Bin("gt", Col("i"), Lit(1)), Lit("big")),
            (Bin("eq", Col("i"), Lit(1)), Lit("one")),
        ),
        else_=Lit("other"),
    )
    assert ev(e, T) == ["one", "big", "other"]


def test_array_index_1based_oob_null():
    # expression_execution.rs:516-532
    assert ev(Index(Col("arr"), Lit(1)), T) == [10, 30, None]
    assert ev(Index(Col("arr"), Lit(2)), T) == [20, None, None]
    assert ev(Index(Col("arr"), Lit(5)), T) == [None, None, None]


def test_scalar_functions():
    assert ev(Func("length", (Col("s"),)), T) == [3, 3, None]
    assert ev(Func("upper", (Col("s"),)), T) == ["ABC", "XYZ", None]
    assert ev(Func("lower", (Col("s"),)), T) == ["abc", "xyz", None]
    assert ev(Func("abs", (Col("f"),)), T) == [1.5, 2.0, None]
    assert ev(Func("greatest", (Col("i"), Lit(2))), T)[:2] == [2, 2]
    assert ev(Func("least", (Col("i"), Lit(2))), T)[:2] == [1, 2]
    assert ev(Func("pow", (Lit(2.0), Lit(3.0))), T) == 8.0
    assert ev(Func("array_length", (Col("arr"),)), T) == [2, 1, None]


def test_regexp_matches_null_is_false():
    assert ev(Func("regexp_matches", (Col("s"), Lit("^a"))), T) == [True, False, False]


def test_array_functions():
    assert ev(Func("array_unique", (Col("arr"),)), T) == [[10, 20], [30], None]
    assert ev(Func("array_append", (Col("arr"), Lit(99))), T) == [
        [10, 20, 99],
        [30, 99],
        None,
    ]
    assert ev(Func("array_prepend", (Lit(0), Col("arr"))), T) == [
        [0, 10, 20],
        [0, 30],
        None,
    ]
    assert ev(Func("array_cat", (Col("arr"), Col("arr"))), T) == [
        [10, 20, 10, 20],
        [30, 30],
        None,
    ]


def test_timestamp_extract_and_trunc():
    assert ev(Func("timestamp_extract_year", (Col("ts"),)), T) == [2005, 2020, None]
    assert ev(Func("timestamp_extract_hour", (Col("ts"),)), T) == [7, 0, None]
    out = ev(Func("date_trunc", (Lit("hour"), Col("ts"))), T)
    assert out[0] == dt.datetime(2005, 6, 17, 7, 0, 0)
    epoch = ev(Func("timestamp_extract_epoch", (Col("ts"),)), T)
    assert epoch[1] == dt.datetime(2020, 1, 1).timestamp() or abs(
        epoch[1] - 1577836800.0
    ) < 1e-6


def test_make_timestamp_invalid_date_null():
    e = Func(
        "make_timestamp",
        (Lit(2021), Lit(2), Lit(30), Lit(0), Lit(0), Lit(0), Lit(0)),
    )
    assert ev(e, T.slice(0, 1)) == [None]


def test_now_is_injectable():
    pinned = dt.datetime(2020, 5, 5, 12, 0, 0)
    ctx = CompileCtx(now=pinned)
    assert ev(Func("now", ()), T, ctx) == pinned


def test_cast_string_to_int_and_back():
    t = pa.table({"s": pa.array(["12", "x", None])})
    assert ev(Cast(Col("s"), INT), t) == [12, None, None]
    t2 = pa.table({"f": pa.array([1.5, 2.0])})
    # Display formatting: floats {:.2} (model.rs:335-353)
    assert ev(Cast(Col("f"), STRING), t2) == ["1.50", "2.00"]


def test_string_timestamp_compare_coerces():
    res = ev(Bin("lt", Col("ts"), Lit("2010-01-01 00:00:00")), T)
    assert res == [True, False, False]


def test_predicate_nulls_blocked():
    pred = compile_predicate(Bin("gt", Col("i"), Lit(1)))
    assert pred(T).to_pylist() == [False, True, False]


def test_vectorized_list_kernels_edge_cases():
    """Round-5 vectorization of create_array / array_unique (VERDICT r4
    #8) — NULL lists, NULL elements, empty lists, chunked input, string
    element types, and the mixed-type create_array fallback all match
    the old per-row semantics."""
    import random

    from sqlgrep_ray.functions.exprs import Col, Func, compile_expr

    def run(expr, t):
        got = compile_expr(expr, None)(t)
        if isinstance(got, pa.ChunkedArray):
            got = got.combine_chunks()
        return got.to_pylist()

    rng = random.Random(7)
    for _ in range(20):
        n = rng.randint(0, 30)
        rows = [
            None
            if rng.random() < 0.15
            else [
                rng.choice([None, rng.randint(-5, 5)])
                for _ in range(rng.randint(0, 6))
            ]
            for _ in range(n)
        ]
        t = pa.table(
            {
                "arr": pa.array(rows, pa.list_(pa.int64())),
                "a": pa.array(list(range(n)), pa.int64()),
                "b": pa.array(
                    [rng.choice([None, 1]) for _ in range(n)], pa.int64()
                ),
            }
        )
        want = [
            None if l is None else sorted({e for e in l if e is not None})
            for l in rows
        ]
        assert run(Func("array_unique", (Col("arr"),)), t) == want
        want2 = [[x, y] for x, y in zip(t["a"].to_pylist(), t["b"].to_pylist())]
        assert run(Func("create_array", (Col("a"), Col("b"))), t) == want2

    chunked = pa.chunked_array(
        [
            pa.array([[2, 1], [1, 1, None]], pa.list_(pa.int64())),
            pa.array([None, [4], []], pa.list_(pa.int64())),
        ]
    )
    t2 = pa.table({"arr": chunked})
    assert run(Func("array_unique", (Col("arr"),)), t2) == [
        [1, 2], [1], None, [4], [],
    ]
    s = pa.table(
        {"arr": pa.array([["b", "a", "b", None], ["z"], None], pa.list_(pa.string()))}
    )
    assert run(Func("array_unique", (Col("arr"),)), s) == [["a", "b"], ["z"], None]
