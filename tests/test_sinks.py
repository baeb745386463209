"""Sink formatting parity (reference Display, model.rs:335-353)."""

import datetime as dt

import pyarrow as pa

from sqlgrep_ray.sinks import format_csv, format_json, format_text, format_value


def test_format_value_display_parity():
    assert format_value(None) == "NULL"
    assert format_value(42) == "42"
    assert format_value(3.14159) == "3.14"  # {:.2}
    assert format_value(True) == "true" and format_value(False) == "false"
    assert format_value("abc") == "'abc'"
    assert format_value(["a", "b"]) == "{'a', 'b'}"
    assert (
        format_value(dt.datetime(2005, 6, 17, 7, 7, 0, 123000))
        == "2005-06-17 07:07:00.123"
    )
    assert format_value(dt.timedelta(hours=1, minutes=2, seconds=3, milliseconds=45)) == "01:02:03.045"


def _tbl():
    return pa.table(
        {
            "name": ["a", None],
            "n": [1, 2],
            "x": [1.5, 2.25],
        }
    )


def test_format_text():
    assert format_text(_tbl()) == [
        "name: 'a', n: 1, x: 1.50",
        "name: NULL, n: 2, x: 2.25",
    ]


def test_format_text_input_passthrough():
    t = pa.table({"input": ["raw line 1", "raw line 2"]})
    assert format_text(t) == ["raw line 1", "raw line 2"]


def test_format_json():
    lines = format_json(_tbl())
    import json

    assert json.loads(lines[0]) == {"name": "a", "n": 1, "x": 1.5}
    assert json.loads(lines[1]) == {"name": None, "n": 2, "x": 2.25}


def test_format_csv():
    lines = format_csv(_tbl())
    assert lines[0] == "name;n;x"
    assert lines[1] == "'a';1;1.50"
