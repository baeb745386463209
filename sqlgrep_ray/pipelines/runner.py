"""Plan × Dataset → lazy Ray Data pipeline.

The execution layer replacing the reference's per-line push engine
(``src/execution_engine.rs:136-175``): everything is expressed as
``map_batches`` over zero-copy Arrow batches plus at most one
``groupby`` shuffle; the pipeline stays lazy/streaming until a sink or a
small result consumption.

Select path  (select_execution.rs:21-57):
    [join] → where-filter → project → [distinct] → [limit]
Aggregate path (aggregate_execution.rs):
    [join (OUTER downgraded to INNER, execution_engine.rs:227-244)]
    → where-filter → partial-agg combiner → groupby shuffle → finalize
    → having → [distinct] → sort(group keys) → [limit]
"""

from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sqlgrep_ray.functions.exprs import (
    CompileCtx,
    compile_expr,
    compile_predicate,
    _as_array,
)
from sqlgrep_ray.pipelines.plan import (
    AggregatePlan,
    JoinSpec,
    Plan,
    Projection,
    SelectPlan,
)
from sqlgrep_ray.stages.aggregate import (
    _CONST_KEY,
    FinalizeAggregates,
    GroupEvaluator,
    HolisticGroupAgg,
    PartialAggregator,
    _merge_aggs,
    apply_transforms,
    is_holistic,
)
from sqlgrep_ray.stages.enrich import BroadcastJoiner


def run_plan(
    ds: "ray.data.Dataset",
    plan: Plan,
    ctx: Optional[CompileCtx] = None,
    batch_size: Optional[int] = None,
) -> "ray.data.Dataset":
    if isinstance(plan, SelectPlan):
        return run_select(ds, plan, ctx, batch_size)
    if isinstance(plan, AggregatePlan):
        return run_aggregate(ds, plan, ctx, batch_size)
    raise TypeError(f"unknown plan {type(plan)}")


def _apply_join(
    ds: "ray.data.Dataset", join: Optional[JoinSpec], force_inner: bool
) -> "ray.data.Dataset":
    if join is None:
        return ds
    how = "inner" if force_inner else join.how
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(
            right=join.right,
            left_key=join.left_key,
            right_key=join.right_key,
            how=how,
            right_prefix=join.right_prefix,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _apply_where(
    ds: "ray.data.Dataset", where, ctx: Optional[CompileCtx]
) -> "ray.data.Dataset":
    if where is None:
        return ds
    pred = compile_predicate(where, ctx)
    return ds.map_batches(
        lambda t: t.filter(pred(t)), batch_format="pyarrow", zero_copy_batch=True
    )


def _distinct(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact dedup: hash-partition by the full row, keep one per group
    (SURVEY.md §2.8; the reference's first-seen order is not reproducible on
    unordered blocks — result SET equality is the contract)."""

    cols = ds.schema().names

    def block_head(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    # per-block pre-dedup (combiner) then global groupby-first
    def block_dedup(t: pa.Table) -> pa.Table:
        return t.group_by(t.column_names).aggregate([])

    ds = ds.map_batches(block_dedup, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby(cols).map_groups(block_head, batch_format="pyarrow")


def run_select(
    ds: "ray.data.Dataset",
    plan: SelectPlan,
    ctx: Optional[CompileCtx] = None,
    batch_size: Optional[int] = None,
) -> "ray.data.Dataset":
    ds = _apply_join(ds, plan.join, force_inner=False)
    ds = _apply_where(ds, plan.where, ctx)

    if plan.projections is not None:
        kernels = [(p.name, compile_expr(p.expr, ctx)) for p in plan.projections]

        def project(t: pa.Table) -> pa.Table:
            return pa.table({n: _as_array(k(t), t.num_rows) for n, k in kernels})

        ds = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    if plan.distinct:
        ds = _distinct(ds)
    if plan.limit is not None:
        ds = ds.limit(plan.limit)  # streaming executor early-stops upstream
    return ds


def run_aggregate(
    ds: "ray.data.Dataset",
    plan: AggregatePlan,
    ctx: Optional[CompileCtx] = None,
    batch_size: Optional[int] = None,
) -> "ray.data.Dataset":
    # OUTER degrades to INNER under aggregation (execution_engine.rs:227-244)
    ds = _apply_join(ds, plan.join, force_inner=True)
    ds = _apply_where(ds, plan.where, ctx)

    key_names = [k.name for k in plan.group_by]
    gb_keys = key_names or [_CONST_KEY]

    if is_holistic(plan):
        ds = ds.map_batches(
            GroupEvaluator(plan, ctx), batch_format="pyarrow", zero_copy_batch=True
        )
        hga = HolisticGroupAgg(plan, ctx)

        def holistic_group(g: pa.Table) -> pa.Table:
            return hga(g)

        agged = ds.groupby(gb_keys).map_groups(holistic_group, batch_format="pyarrow")
    else:
        ds = ds.map_batches(
            PartialAggregator(plan, ctx), batch_format="pyarrow", zero_copy_batch=True
        )
        merged = ds.groupby(gb_keys).aggregate(*_merge_aggs(plan))
        agged = merged.map_batches(
            FinalizeAggregates(plan, ctx), batch_format="pyarrow"
        )
        if not key_names:
            agged = agged.map_batches(
                lambda t: t.drop_columns([_CONST_KEY])
                if _CONST_KEY in t.column_names
                else t,
                batch_format="pyarrow",
            )

    if plan.having is not None:
        pred = compile_predicate(plan.having, ctx)
        agged = agged.map_batches(
            lambda t: t.filter(pred(t)), batch_format="pyarrow"
        )
    # drop having-only aggregate slots
    having_only = [a.name for a in plan.aggs if a.name.startswith("__having")]
    if having_only:
        agged = agged.map_batches(
            lambda t: t.drop_columns([c for c in having_only if c in t.column_names]),
            batch_format="pyarrow",
        )
    if plan.distinct:
        agged = _distinct(agged)
    if key_names:
        agged = agged.sort(key_names)  # BTreeMap order parity (SURVEY §2.6)
    if plan.limit is not None:
        agged = agged.limit(plan.limit)
    return agged
