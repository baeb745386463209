"""Hypothesis: the compiled Arrow expression engine matches an independent
per-row interpreter of the reference semantics (null-compare ⇒ false,
truncating int division, bool-coercing AND/OR, null-safe IS, first-true
CASE, NULL-passthrough NOT/neg) on randomly generated typed expressions
and data. The interpreter here is written from the SEMANTICS (SURVEY §2.3),
not from the compiler — a genuine second implementation."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlgrep_ray.functions.exprs import (
    Bin,
    Case,
    Col,
    Func,
    InList,
    Lit,
    Un,
    _as_array,
    compile_expr,
)

INT_COLS = ("a", "b")
NZ_COL = "d"  # nonzero divisor column
FLT_COLS = ("x", "y")
BOOL_COL = "p"
STR_COL = "s"


# --- typed expression generators -------------------------------------------

def int_expr(depth):
    leaf = st.one_of(
        st.sampled_from([Col(c) for c in INT_COLS + (NZ_COL,)]),
        st.integers(min_value=-5, max_value=5).map(Lit),
    )
    if depth <= 0:
        return leaf
    sub = int_expr(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["add", "sub", "mul"]), sub, sub).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
        sub.map(lambda e: Bin("div", e, Col(NZ_COL))),
        sub.map(lambda e: Un("neg", e)),
        sub.map(lambda e: Func("abs", (e,))),
        st.tuples(st.sampled_from(["greatest", "least"]), sub, sub).map(
            lambda t: Func(t[0], (t[1], t[2]))
        ),
        st.tuples(bool_expr(depth - 1), sub, sub).map(
            lambda t: Case(whens=((t[0], t[1]),), else_=t[2])
        ),
    )


def float_expr(depth):
    leaf = st.sampled_from([Col(c) for c in FLT_COLS])
    if depth <= 0:
        return leaf
    sub = float_expr(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["add", "sub", "mul"]), sub, sub).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
        sub.map(lambda e: Un("neg", e)),
    )


def bool_expr(depth):
    cmp_ops = ["eq", "ne", "gt", "ge", "lt", "le"]
    leaf = st.one_of(
        st.sampled_from([Col(BOOL_COL)]),
        st.booleans().map(Lit),
        st.tuples(st.sampled_from(cmp_ops), int_expr(0), int_expr(0)).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
    )
    if depth <= 0:
        return leaf
    sub = bool_expr(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(cmp_ops), int_expr(depth - 1), int_expr(depth - 1)).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
        st.tuples(st.sampled_from(cmp_ops), float_expr(depth - 1), float_expr(depth - 1)).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
        st.tuples(st.sampled_from(["and", "or"]), sub, sub).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
        sub.map(lambda e: Un("not", e)),
        st.tuples(st.sampled_from(["is", "is_not"]), int_expr(depth - 1), int_expr(depth - 1)).map(
            lambda t: Bin(t[0], t[1], t[2])
        ),
        st.tuples(
            int_expr(depth - 1),
            st.lists(st.integers(-5, 5), min_size=1, max_size=4),
            st.booleans(),
        ).map(lambda t: InList(t[0], tuple(Lit(v) for v in t[1]), t[2])),
    )


ANY_EXPR = st.one_of(int_expr(3), float_expr(3), bool_expr(3))


# --- reference interpreter (per row) ---------------------------------------

def ev(e, row):
    if isinstance(e, Col):
        return row[e.name]
    if isinstance(e, Lit):
        return e.value
    if isinstance(e, Bin):
        if e.op in ("eq", "ne", "gt", "ge", "lt", "le"):
            l, r = ev(e.left, row), ev(e.right, row)
            if l is None or r is None:
                return False  # NULL compare => false
            import operator as op_

            return {
                "eq": op_.eq, "ne": op_.ne, "gt": op_.gt,
                "ge": op_.ge, "lt": op_.lt, "le": op_.le,
            }[e.op](l, r)
        if e.op in ("is", "is_not"):
            l, r = ev(e.left, row), ev(e.right, row)
            res = (l is None and r is None) or (
                l is not None and r is not None and l == r
            )
            return (not res) if e.op == "is_not" else res
        if e.op in ("add", "sub", "mul", "div"):
            l, r = ev(e.left, row), ev(e.right, row)
            if l is None or r is None:
                return None
            if e.op == "add":
                return l + r
            if e.op == "sub":
                return l - r
            if e.op == "mul":
                return l * r
            if isinstance(l, int) and isinstance(r, int):
                q = abs(l) // abs(r)  # truncating int division
                return q if (l >= 0) == (r >= 0) else -q
            return l / r
        if e.op in ("and", "or"):
            l, r = ev(e.left, row), ev(e.right, row)
            lb = l if isinstance(l, bool) else False  # Value.bool()
            rb = r if isinstance(r, bool) else False
            return (lb and rb) if e.op == "and" else (lb or rb)
        raise AssertionError(e.op)
    if isinstance(e, Un):
        v = ev(e.operand, row)
        if v is None:
            return None  # NULL passes through
        return -v if e.op == "neg" else (not v)
    if isinstance(e, InList):
        v = ev(e.operand, row)
        res = False if v is None else v in [ev(i, row) for i in e.items]
        return (not res) if e.negated else res
    if isinstance(e, Case):
        for c, val in e.whens:
            cb = ev(c, row)
            if cb is True:  # non-true (incl. NULL) falls through
                return ev(val, row)
        return ev(e.else_, row)
    if isinstance(e, Func):
        args = [ev(a, row) for a in e.args]
        if e.name == "abs":
            return None if args[0] is None else abs(args[0])
        if e.name in ("greatest", "least"):
            l, r = args
            if l is None:
                return r
            if r is None:
                return l
            return max(l, r) if e.name == "greatest" else min(l, r)
        raise AssertionError(e.name)
    raise AssertionError(e)


# --- data + comparison ------------------------------------------------------

_opt_int = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
_opt_flt = st.one_of(
    st.none(),
    st.floats(min_value=-50, max_value=50, allow_nan=False).map(
        lambda v: round(v, 3)
    ),
)
_opt_bool = st.one_of(st.none(), st.booleans())


@st.composite
def table_and_rows(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    cols = {}
    for c in INT_COLS:
        cols[c] = draw(st.lists(_opt_int, min_size=n, max_size=n))
    cols[NZ_COL] = draw(
        st.lists(
            st.integers(min_value=1, max_value=7).flatmap(
                lambda v: st.sampled_from([v, -v])
            ),
            min_size=n,
            max_size=n,
        )
    )
    for c in FLT_COLS:
        cols[c] = draw(st.lists(_opt_flt, min_size=n, max_size=n))
    cols[BOOL_COL] = draw(st.lists(_opt_bool, min_size=n, max_size=n))
    t = pa.table(
        {
            **{c: pa.array(cols[c], pa.int64()) for c in INT_COLS + (NZ_COL,)},
            **{c: pa.array(cols[c], pa.float64()) for c in FLT_COLS},
            BOOL_COL: pa.array(cols[BOOL_COL], pa.bool_()),
        }
    )
    rows = [{c: cols[c][i] for c in cols} for i in range(n)]
    return t, rows


@settings(max_examples=300, deadline=None)
@given(ANY_EXPR, table_and_rows())
def test_compiled_matches_interpreter(expr, data):
    t, rows = data
    kernel = compile_expr(expr)
    got = _as_array(kernel(t), t.num_rows).to_pylist()
    want = [ev(expr, row) for row in rows]
    for g, w, row in zip(got, want, rows):
        if isinstance(w, float) and isinstance(g, float):
            assert g == w or abs(g - w) < 1e-12, (expr, row, g, w)
        else:
            assert g == w, (expr, row, g, w)
