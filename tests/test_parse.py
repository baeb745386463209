"""Parse-stage semantics, mirroring the reference's extraction goldens
(``/root/reference/src/data_model.rs:517-1114``). Pure pyarrow — no Ray."""

import datetime as dt

import pyarrow as pa
import pytest

from sqlgrep_ray.schema import (
    BOOL,
    INT,
    STRING,
    TIMESTAMP,
    ColumnDef,
    JsonPath,
    MultiRegex,
    PatternDef,
    RegexCapture,
    RegexRef,
    TableDef,
    array_of,
    parse_type_name,
)
from sqlgrep_ray.stages.parse import ParseTable

FTPD = (
    r"connection from ([0-9.]+) \((.+)?\) at ([a-zA-Z]+) ([a-zA-Z]+) "
    r"([0-9]+) ([0-9]+):([0-9]+):([0-9]+) ([0-9]+)"
)

LINE_FULL = (
    "Jun 17 07:07:00 combo ftpd[11742]: connection from 82.68.222.195 "
    "(lns-vlq-45.bru.adsl.nextra.be) at Fri Jun 17 07:07:00 2005"
)
LINE_NOHOST = (
    "Jun 17 07:08:27 combo ftpd[11763]: connection from 222.33.90.199 "
    "() at Fri Jun 17 07:08:27 2005"
)


def ftpd_table(**host_opts):
    return TableDef(
        "connections",
        [PatternDef("line", FTPD)],
        [
            ColumnDef("ip", STRING, RegexCapture(RegexRef("line", 1))),
            ColumnDef("hostname", STRING, RegexCapture(RegexRef("line", 2)), **host_opts),
            ColumnDef("year", INT, RegexCapture(RegexRef("line", 9))),
            ColumnDef("month", STRING, RegexCapture(RegexRef("line", 4))),
            ColumnDef("day", INT, RegexCapture(RegexRef("line", 5))),
            ColumnDef("hour", INT, RegexCapture(RegexRef("line", 6))),
            ColumnDef("minute", INT, RegexCapture(RegexRef("line", 7))),
            ColumnDef("second", INT, RegexCapture(RegexRef("line", 8))),
        ],
    )


def run(tdef, lines, **kw):
    return ParseTable(tdef, "text", **kw)(pa.table({"text": lines})).to_pylist()


def test_capture_groups_typed():
    rows = run(ftpd_table(), [LINE_FULL])
    assert rows == [
        {
            "ip": "82.68.222.195",
            "hostname": "lns-vlq-45.bru.adsl.nextra.be",
            "year": 2005,
            "month": "Jun",
            "day": 17,
            "hour": 7,
            "minute": 7,
            "second": 0,
        }
    ]


def test_missing_optional_group_is_null():
    rows = run(ftpd_table(), [LINE_NOHOST])
    assert rows[0]["hostname"] is None
    assert rows[0]["ip"] == "222.33.90.199"


def test_non_matching_line_dropped():
    rows = run(ftpd_table(), ["nothing to see here", None])
    assert rows == []


def test_default_fills_unmatched_lines_and_admits_row():
    # mirrors test_ftpd8 (integration_tests.rs:255-273): with DEFAULT, even
    # non-matching lines produce a row (hostname='unknown', rest NULL)
    rows = run(ftpd_table(default="unknown"), [LINE_NOHOST, "noise"])
    assert rows[0]["hostname"] == "unknown"
    assert rows[1] == {
        "ip": None,
        "hostname": "unknown",
        "year": None,
        "month": None,
        "day": None,
        "hour": None,
        "minute": None,
        "second": None,
    }


def test_not_null_drops_row():
    tdef = TableDef(
        "t",
        [PatternDef("line", FTPD)],
        [
            ColumnDef("ip", STRING, RegexCapture(RegexRef("line", 1))),
            ColumnDef(
                "hostname", STRING, RegexCapture(RegexRef("line", 2)), not_null=True
            ),
        ],
    )
    rows = run(tdef, [LINE_FULL, LINE_NOHOST])
    assert len(rows) == 1
    assert rows[0]["hostname"] == "lns-vlq-45.bru.adsl.nextra.be"


def test_bool_is_group_existence_only_when_matched():
    tdef = TableDef(
        "t",
        [PatternDef("line", r"connection from ([0-9.]+) \((.+)?\)")],
        [
            ColumnDef("ip", STRING, RegexCapture(RegexRef("line", 1))),
            ColumnDef("has_host", BOOL, RegexCapture(RegexRef("line", 2))),
        ],
    )
    rows = run(tdef, [LINE_FULL, LINE_NOHOST, "noise"])
    assert [r["has_host"] for r in rows] == [True, False]  # noise dropped


def test_trim():
    tdef = TableDef(
        "t",
        [PatternDef("line", r"name: (.+)")],
        [ColumnDef("name", STRING, RegexCapture(RegexRef("line", 1)), trim=True)],
    )
    assert run(tdef, ["name:    padded   "]) == [{"name": "padded"}]


def test_multi_group_timestamp_with_month_names():
    tdef = TableDef(
        "t",
        [PatternDef("line", FTPD)],
        [
            ColumnDef(
                "timestamp",
                TIMESTAMP,
                MultiRegex(
                    tuple(RegexRef("line", g) for g in (9, 4, 5, 6, 7, 8))
                ),
            )
        ],
    )
    rows = run(tdef, [LINE_FULL])
    assert rows == [{"timestamp": dt.datetime(2005, 6, 17, 7, 7, 0)}]


def test_multi_group_array():
    tdef = TableDef(
        "t",
        [PatternDef("line", FTPD)],
        [
            ColumnDef(
                "parts",
                array_of(INT),
                MultiRegex((RegexRef("line", 6), RegexRef("line", 7), RegexRef("line", 8))),
            )
        ],
    )
    assert run(tdef, [LINE_FULL]) == [{"parts": [7, 7, 0]}]


def test_split_mode_1based_with_whole_line_at_0():
    tdef = TableDef(
        "csv",
        [PatternDef("s", ";", "split")],
        [
            ColumnDef("whole", STRING, RegexCapture(RegexRef("s", 0))),
            ColumnDef("ip", STRING, RegexCapture(RegexRef("s", 1))),
            ColumnDef("year", INT, RegexCapture(RegexRef("s", 3)), not_null=True),
        ],
    )
    rows = run(tdef, ["1.2.3.4;host;2005", "ip;hostname;year", "short;x"])
    # header dropped (year INT NOT NULL fails to parse "year"); short row dropped
    assert rows == [{"whole": "1.2.3.4;host;2005", "ip": "1.2.3.4", "year": 2005}]


def test_json_paths_convert_and_arrays():
    tdef = TableDef(
        "clients",
        [],
        [
            ColumnDef("timestamp", INT, JsonPath(("timestamp",))),
            ColumnDef("device_id", INT, JsonPath(("metadata", "device_id")), convert=True),
            ColumnDef("mac", STRING, JsonPath(("metadata", "mac_address"))),
            ColumnDef("events", array_of(STRING), JsonPath(("events",))),
            ColumnDef("first_event", STRING, JsonPath(("events", 0))),
        ],
    )
    rows = run(
        tdef,
        [
            '{"timestamp": 1609789423312, "metadata": {"device_id": "167", '
            '"mac_address": "10:41:11:98:03:35"}, "events": ["started", "stopped"]}',
            '{"timestamp": 7}',
            "not json at all",
        ],
    )
    assert rows[0] == {
        "timestamp": 1609789423312,
        "device_id": 167,
        "mac": "10:41:11:98:03:35",
        "events": ["started", "stopped"],
        "first_event": "started",
    }
    assert rows[1]["events"] is None and rows[1]["device_id"] is None
    assert len(rows) == 2  # non-JSON line has no results → dropped


def test_json_array_element_type_mismatch_becomes_null():
    # data_model.rs:1098-1114
    tdef = TableDef(
        "t",
        [],
        [ColumnDef("xs", array_of(INT), JsonPath(("xs",)))],
    )
    rows = run(tdef, ['{"xs": [1, "two", 3]}'])
    assert rows == [{"xs": [1, None, 3]}]


def test_keep_cols_passthrough_and_input_pseudo_column():
    tdef = TableDef(
        "t",
        [PatternDef("line", r"user=(\w+)")],
        [ColumnDef("user", STRING, RegexCapture(RegexRef("line", 1)))],
    )
    batch = pa.table({"text": ["x user=bob", "nope"], "conv_id": ["c1", "c2"]})
    out = ParseTable(tdef, "text", keep_cols=["conv_id"], add_input_col=True)(batch)
    assert out.to_pylist() == [
        {"conv_id": "c1", "input": "x user=bob", "user": "bob"}
    ]


def test_parse_type_names():
    assert parse_type_name("real[][]").kind == "array"
    assert parse_type_name("TEXT") == STRING
    assert parse_type_name("int") == INT
