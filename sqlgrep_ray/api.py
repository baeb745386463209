"""Public library API — the Ray-Data analogue of sqlgrep's Python bindings.

The reference exposes (pyo3 module ``libsqlgrep``, ``src/python_wrapper.rs``):
``Tables.add_table(text)``, ``execute_query(lines, sql) -> list[dict]``, and
query compilation for reuse. This module mirrors that surface on Ray Data:

    tables = Tables()
    tables.add_tables(CREATE_TABLE_SQL)
    ds = tables.execute_query(sql, source=dataset_or_path)   # lazy Dataset
    rows = tables.execute_query_rows(sql, source=lines_list) # list[dict]

``source`` may be a ``ray.data.Dataset`` with a raw-text column, a path (text
file → ``ray.data.read_text``; .parquet → ``read_parquet``), or a list of
strings. ``FROM table::'file'`` bindings in the SQL override ``source``
(reference ``main.rs:146-156``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Union

import pyarrow as pa
import ray.data

from sqlgrep_ray.functions.exprs import (
    Bin,
    Case,
    Cast,
    Col,
    Expr,
    Func,
    Index,
    InList,
    Un,
)
from sqlgrep_ray.pipelines.plan import (
    AggregatePlan,
    JoinSpec,
    Projection,
    SelectPlan,
)
from sqlgrep_ray.pipelines.runner import run_plan
from sqlgrep_ray.schema import TableDef
from sqlgrep_ray.sqlfront import Query, SqlError, parse, parse_query
from sqlgrep_ray.stages.parse import ParseTable

Source = Union["ray.data.Dataset", str, list]


def _rewrite_cols(e: Expr, fn) -> Expr:
    if isinstance(e, Col):
        return fn(e)
    if isinstance(e, Bin):
        return Bin(e.op, _rewrite_cols(e.left, fn), _rewrite_cols(e.right, fn))
    if isinstance(e, Un):
        return Un(e.op, _rewrite_cols(e.operand, fn))
    if isinstance(e, InList):
        return InList(
            _rewrite_cols(e.operand, fn),
            tuple(_rewrite_cols(i, fn) for i in e.items),
            e.negated,
        )
    if isinstance(e, Func):
        return Func(e.name, tuple(_rewrite_cols(a, fn) for a in e.args))
    if isinstance(e, Case):
        return Case(
            tuple(
                (_rewrite_cols(c, fn), _rewrite_cols(v, fn)) for c, v in e.whens
            ),
            _rewrite_cols(e.else_, fn),
        )
    if isinstance(e, Cast):
        return Cast(_rewrite_cols(e.operand, fn), e.vtype)
    if isinstance(e, Index):
        return Index(_rewrite_cols(e.operand, fn), _rewrite_cols(e.index, fn))
    return e


class ReadLinesIterator:
    """Iterate a text file's lines, newline-stripped — the reference's
    ``ReadLinesIterator`` (``python_wrapper.rs:329-357``), used to feed
    ``execute_query(lines_iter, …)``."""

    def __init__(self, filename: str):
        self._fh = open(filename)

    def __iter__(self) -> "ReadLinesIterator":
        return self

    def __next__(self) -> str:
        line = self._fh.readline()
        if not line:
            self._fh.close()
            raise StopIteration
        return line.rstrip("\n")


class FollowFileIterator:
    """Tail ONE growing text file — the reference's ``FollowFileIterator``
    (``python_wrapper.rs:359-379``; ``helpers.rs:82-118``): seek to the end
    (or the start with ``head=True``), poll for complete lines, and hold
    partial lines until their ``\\n`` arrives.

    ``max_polls`` bounds the idle polls before StopIteration (the reference
    blocks forever; a bound makes the iterator testable/driveable)."""

    def __init__(
        self,
        filename: str,
        head: bool = False,
        poll_interval: float = 0.2,
        max_polls: Optional[int] = None,
    ):
        import io

        self._fh = open(filename)
        if not head:
            self._fh.seek(0, io.SEEK_END)
        self._poll = poll_interval
        self._max_polls = max_polls

    def __iter__(self) -> "FollowFileIterator":
        return self

    def __next__(self) -> str:
        import time as _time

        buf = ""
        idle = 0
        while True:
            chunk = self._fh.readline()
            buf += chunk
            if buf.endswith("\n"):
                return buf.rstrip("\n")
            if not chunk:
                idle += 1
                if self._max_polls is not None and idle > self._max_polls:
                    self._fh.close()
                    raise StopIteration
                _time.sleep(self._poll)


class Tables:
    """Catalog of table definitions (reference ``Tables``, data_model.rs:458-515)."""

    def __init__(self) -> None:
        self._tables: dict[str, TableDef] = {}

    def add_table(self, tdef: TableDef) -> None:
        self._tables[tdef.name] = tdef

    def add_tables(self, definitions_sql: str) -> None:
        for stmt in parse(definitions_sql):
            if isinstance(stmt, TableDef):
                self._tables[stmt.name] = stmt

    def __getitem__(self, name: str) -> TableDef:
        if name not in self._tables:
            raise SqlError(f"unknown table {name!r}")
        return self._tables[name]

    def get_table(self, name: str) -> TableDef:
        """Reference ``get_table`` (``python_wrapper.rs:73-76``)."""
        return self[name]

    def table_names(self) -> list[str]:
        """Reference ``table_names`` (``python_wrapper.rs:69-71``)."""
        return sorted(self._tables)

    def tables(self) -> list[TableDef]:
        """Reference ``tables`` (``python_wrapper.rs:60-67``)."""
        return [self._tables[n] for n in sorted(self._tables)]

    # -- execution ---------------------------------------------------------

    def _as_dataset(self, source: Source, text_col: str) -> "ray.data.Dataset":
        if isinstance(source, ray.data.Dataset):
            return source
        if isinstance(source, str):
            if source.endswith(".parquet") or os.path.isdir(source):
                # prune at the read: the parse stage only consumes the raw
                # text column (select_columns later would NOT prune the scan)
                from sqlgrep_ray.sources import read_parquet_clean

                return read_parquet_clean(source, columns=[text_col])
            return ray.data.read_text(source)
        # iterable of raw lines
        return ray.data.from_arrow(
            pa.table({text_col: pa.array(list(source), pa.string())})
        )

    def _parse_stage(
        self,
        ds: "ray.data.Dataset",
        tdef: TableDef,
        text_col: str,
        add_input: bool,
    ) -> "ray.data.Dataset":
        return ds.map_batches(
            ParseTable(tdef, text_col, add_input_col=add_input),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _build_join_side(
        self, q: Query, source: Optional[Source], text_col: str
    ) -> pa.Table:
        """Fully materialize the joined table (reference semantics: 'loaded
        completely in memory', README.md:56 / join.rs:30-79)."""
        jdef = self[q.join_table]
        src: Source
        if q.join_file is not None:
            src = q.join_file
        elif source is not None:
            src = source
        else:
            raise SqlError(f"no source for joined table {q.join_table!r}")
        ds = self._as_dataset(src, text_col)
        parsed = self._parse_stage(ds, jdef, text_col, add_input=False)
        batches = list(parsed.iter_batches(batch_format="pyarrow"))
        if not batches:
            return jdef.arrow_schema().empty_table()
        return pa.concat_tables(batches, promote_options="default")

    def compile_query(
        self,
        sql: str,
        source: Optional[Source] = None,
        join_source: Optional[Source] = None,
        text_col: str = "text",
    ):
        """Compile sql → (Query, bound plan builder). Returns a closure
        ``run(ds) -> Dataset`` plus the parse stage pre-applied."""
        q = parse_query(sql)
        tdef = self[q.table]
        streamed_cols = [c.name for c in tdef.columns]

        plan = q.plan
        join = None
        prefix = ""
        right_cols: list[str] = []
        if q.join_table is not None:
            right = self._build_join_side(q, join_source, text_col)
            prefix = f"{q.join_table}."
            right_cols = right.column_names
            join = JoinSpec(
                right=right,
                left_key=q.join_left_col,
                right_key=q.join_right_col,
                how="left" if q.join_how == "left" else "inner",
                right_prefix=prefix,
            )

        # bind column names: strip own-table qualification; joined columns
        # become "<join_table>.<col>"; unqualified non-clashing joined names
        # resolve to the qualified output column (join.rs:142-173)
        def bind(c: Col) -> Expr:
            n = c.name
            if "." in n:
                t, col = n.split(".", 1)
                if t == q.table:
                    return Col(col)
                if q.join_table is not None and t == q.join_table:
                    return Col(prefix + col)
                return c
            if (
                q.join_table is not None
                and n not in streamed_cols
                and n != "input"
                and n in right_cols
            ):
                return Col(prefix + n)
            return c

        def bind_expr(e: Optional[Expr]) -> Optional[Expr]:
            return None if e is None else _rewrite_cols(e, bind)

        from sqlgrep_ray.sqlfront import _children

        needs_input = False

        def scan_input(e: Optional[Expr]) -> None:
            nonlocal needs_input
            if e is None:
                return
            if isinstance(e, Col) and e.name == "input":
                needs_input = True
            for child in _children(e):
                scan_input(child)

        if isinstance(plan, SelectPlan):
            projs = plan.projections
            if projs is not None:
                for p in projs:
                    scan_input(p.expr)
                projs = tuple(
                    Projection(p.name, bind_expr(p.expr)) for p in projs
                )
            plan = dataclasses.replace(
                plan, projections=projs, where=bind_expr(plan.where), join=join
            )
        else:
            plan = dataclasses.replace(
                plan,
                group_by=tuple(
                    dataclasses.replace(k, expr=bind_expr(k.expr))
                    for k in plan.group_by
                ),
                aggs=tuple(
                    dataclasses.replace(a, arg=bind_expr(a.arg)) for a in plan.aggs
                ),
                where=bind_expr(plan.where),
                having=bind_expr(plan.having),
                join=join,
            )

        def run(ds: "ray.data.Dataset") -> "ray.data.Dataset":
            parsed = self._parse_stage(ds, tdef, text_col, add_input=needs_input)
            return run_plan(parsed, plan)

        # expose the BOUND plan and parse stage for callers that need the
        # pieces (CLI follow mode re-renders aggregates from partials)
        run.plan = plan  # type: ignore[attr-defined]
        run.parse = lambda ds: self._parse_stage(  # type: ignore[attr-defined]
            ds, tdef, text_col, add_input=needs_input
        )
        return q, run

    def execute_query(
        self,
        sql: str,
        source: Optional[Source] = None,
        join_source: Optional[Source] = None,
        text_col: str = "text",
    ) -> "ray.data.Dataset":
        """SQL → lazy Ray Data pipeline over the raw-text source."""
        q, run = self.compile_query(sql, source, join_source, text_col)
        src = q.file if q.file is not None else source
        if src is None:
            raise SqlError("no input source (pass source= or use FROM t::'file')")
        return run(self._as_dataset(src, text_col))

    def execute_query_rows(
        self,
        sql: str,
        source: Optional[Source] = None,
        join_source: Optional[Source] = None,
        text_col: str = "text",
    ) -> list[dict]:
        """Reference ``execute_query`` shape: fully evaluated list of dicts."""
        return self.execute_query(sql, source, join_source, text_col).take_all()

    def execute_query_line(self, sql: str, line: str) -> list[dict]:
        """One raw line → result rows (reference ``execute_query_line``,
        ``python_wrapper.rs:269-282``)."""
        return self.execute_query_rows(sql, source=[line])

    def execute_compiled_query(
        self,
        compiled,
        source: Optional[Source] = None,
        text_col: str = "text",
    ) -> "ray.data.Dataset":
        """Run a ``compile_query`` result against a (new) source — compile
        once, execute per input (reference ``execute_compiled_query``,
        ``python_wrapper.rs:86-91``)."""
        q, run = compiled
        src = q.file if q.file is not None else source
        if src is None:
            raise SqlError("no input source (pass source= or use FROM t::'file')")
        return run(self._as_dataset(src, text_col))

    def execute_compiled_query_callback(
        self,
        compiled,
        callback,
        source: Optional[Source] = None,
        text_col: str = "text",
        batch_size: Optional[int] = 1024,
    ) -> int:
        """Compiled variant of :meth:`execute_query_callback` (reference
        ``python_wrapper.rs:102-110``)."""
        ds = self.execute_compiled_query(compiled, source, text_col)
        delivered = 0
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            rows = batch.to_pylist()
            delivered += len(rows)
            if callback(rows) is False:
                break
        return delivered

    def execute_query_callback(
        self,
        sql: str,
        callback,
        source: Optional[Source] = None,
        join_source: Optional[Source] = None,
        text_col: str = "text",
        batch_size: Optional[int] = 1024,
    ) -> int:
        """Streaming callback API (reference ``execute_query_callback``,
        ``python_wrapper.rs:151-209``): invoke ``callback(rows)`` per result
        batch (a list of row dicts); a ``False`` return STOPS consumption —
        Ray's streaming executor then stops feeding the iterator, so
        upstream work past the already-scheduled blocks is never done.
        Returns the number of rows delivered."""
        ds = self.execute_query(sql, source, join_source, text_col)
        delivered = 0
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            rows = batch.to_pylist()
            delivered += len(rows)
            if callback(rows) is False:
                break
        return delivered
