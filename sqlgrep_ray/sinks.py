"""Output sinks — text / JSON / CSV printers + distributed writers.

Reference parity (SURVEY §2.1 S5-S7):
* text lines ``name: value, …`` with sqlgrep's Display formatting
  (``src/model.rs:335-353``): floats ``{:.2}``, strings quoted ``'…'``,
  arrays ``{a, b}``, timestamps ``%Y-%m-%d %H:%M:%S.%3f``, intervals
  ``HH:MM:SS.mmm``, NULL literal; raw passthrough when the single projection
  is ``input`` (``src/executor.rs:255-309``);
* JSON: one object per row (``Value::json_value``, ``model.rs:321-332``);
* CSV: ``;``-delimited with a single header line.

The format_* helpers operate on small result tables (driver side, for golden
comparisons and the CLI). For big outputs use the distributed writers
(``write_json`` / ``write_csv`` / ``write_parquet`` on the Dataset), which
stream per-block — plus ``route_to_sinks`` for the per-sink Parquet fan-out
(S8).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any, Optional

import pyarrow as pa
import ray.data


def format_value(v: Any) -> str:
    """sqlgrep ``Display`` for one value (``model.rs:335-353``)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.2f}"
    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, (list, tuple)):
        return "{" + ", ".join(format_value(x) for x in v) + "}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond // 1000:03d}"
    if isinstance(v, _dt.timedelta):
        total_s = int(v.total_seconds())
        ms = int(v.total_seconds() * 1000) - total_s * 1000
        return f"{total_s // 3600:02d}:{(total_s // 60) % 60:02d}:{total_s % 60:02d}.{ms:03d}"
    return str(v)


def _json_value(v: Any) -> Any:
    """``Value::json_value`` (``model.rs:321-332``): timestamps/intervals as
    Display strings, everything else native."""
    if isinstance(v, (_dt.datetime, _dt.timedelta)):
        return format_value(v)
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    return v


def _rows_of(result: Any) -> tuple[list[str], list[dict]]:
    if isinstance(result, ray.data.Dataset):
        rows = result.take_all()
        if rows:
            return list(rows[0].keys()), rows
        schema = result.schema(fetch_if_missing=True)
        return (schema.names if schema is not None else []), rows
    if isinstance(result, pa.Table):
        return result.column_names, result.to_pylist()
    # pandas
    return list(result.columns), result.to_dict("records")


def format_text(result: Any) -> list[str]:
    """``name: value, …`` lines; raw passthrough for lone ``input``."""
    cols, rows = _rows_of(result)
    out = []
    for r in rows:
        if cols == ["input"]:
            out.append(str(r["input"]))
        else:
            out.append(", ".join(f"{c}: {format_value(r[c])}" for c in cols))
    return out


def format_json(result: Any) -> list[str]:
    cols, rows = _rows_of(result)
    return [
        json.dumps({c: _json_value(r[c]) for c in cols}, separators=(",", ":"))
        for r in rows
    ]


def format_csv(result: Any, delimiter: str = ";") -> list[str]:
    cols, rows = _rows_of(result)
    out = [delimiter.join(cols)]
    for r in rows:
        out.append(delimiter.join(format_value(r[c]) for c in cols))
    return out


# -- distributed writers -----------------------------------------------------


def write_json(ds: "ray.data.Dataset", path: str) -> None:
    ds.write_json(path)


def write_csv(ds: "ray.data.Dataset", path: str) -> None:
    ds.write_csv(path)


def write_parquet(ds: "ray.data.Dataset", path: str,
                  partition_cols: Optional[list[str]] = None) -> None:
    ds.write_parquet(path, partition_cols=partition_cols)
