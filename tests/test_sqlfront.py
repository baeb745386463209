"""SQL front-end: tokenizer/parser/converter + end-to-end over text fixtures.

Mirrors the reference's integration tests (``src/integration_tests.rs``) on
synthesized equivalents of its golden corpora (FIXTURES.md F2-F6)."""

import pyarrow as pa
import pytest

from sqlgrep_ray.api import Tables
from sqlgrep_ray.pipelines.plan import AggregatePlan, SelectPlan
from sqlgrep_ray.schema import (
    INT,
    STRING,
    TIMESTAMP,
    JsonPath,
    MultiRegex,
    RegexCapture,
)
from sqlgrep_ray.sqlfront import (
    SqlError,
    parse,
    parse_query,
    parse_table_defs,
)

FTPD_DEF = r"""
CREATE TABLE connections(
    line = 'connection from ([0-9.]+) \\((.+)?\\) at ([a-zA-Z]+) ([a-zA-Z]+) ([0-9]+) ([0-9]+):([0-9]+):([0-9]+) ([0-9]+)',

    line[1] => ip TEXT,
    line[2] => hostname TEXT,
    line[9] => year INT,
    line[4] => month TEXT,
    line[5] => day INT,
    line[6] => hour INT,
    line[7] => minute INT,
    line[8] => second INT
);
"""

SSH_DEF = r"""
CREATE TABLE ssh(
    line = 'rhost=([a-zA-Z0-9_\\.\\-]+)\\s+user=(\\w+)',
    line[1] => hostname TEXT,
    line[2] => username TEXT
);
"""

CLIENTS_DEF = """
CREATE TABLE clients(
    { .timestamp } => timestamp INT,
    { .metadata.device_id } => device_id INT CONVERT,
    { .metadata.mac_address } => mac_address TEXT,
    { .events } => events TEXT[]
);
"""

FTPD_LINES = [
    "Jun 17 07:07:00 combo ftpd[11742]: connection from 82.68.222.194 (lns-vlq-45.bru.adsl.example.be) at Fri Jun 17 07:07:00 2005",
    "Jun 17 07:07:02 combo ftpd[11743]: connection from 82.68.222.194 (lns-vlq-45.bru.adsl.example.be) at Fri Jun 17 07:07:02 2005",
    "Jun 18 10:58:59 combo ftpd[31200]: connection from 211.72.151.162 () at Sat Jun 18 10:58:59 2005",
    "Jul 03 02:11:29 combo sshd(pam_unix)[19939]: authentication failure; rhost=set.lilu.com  user=root",
    "Jun 20 12:00:00 combo kernel: noise line without matches",
]

SSH_LINES = [
    "Jul 3 02:11:29 combo sshd(pam_unix)[19939]: authentication failure; logname= uid=0 euid=0 tty=NODEVssh ruser= rhost=set.example.com  user=root",
    "Jul 3 02:11:31 combo sshd(pam_unix)[19939]: authentication failure; rhost=set.example.com  user=root",
    "Jul 4 09:00:00 combo sshd(pam_unix)[11111]: authentication failure; rhost=other.example.net  user=guest",
    "no match here",
]

CLIENT_LINES = [
    '{"timestamp": 1609789423312, "metadata": {"device_id": "167", "mac_address": "10:41:11:98:03:35"}, "events": ["started", "stopped"]}',
    '{"timestamp": 1609789423313, "metadata": {"device_id": "200", "mac_address": "aa:bb:cc:dd:ee:ff"}}',
    '{"timestamp": 1609789423314, "metadata": {"device_id": "93", "mac_address": "00:11:22:33:44:55"}, "events": []}',
]


@pytest.fixture(scope="module")
def tables():
    t = Tables()
    t.add_tables(FTPD_DEF)
    t.add_tables(SSH_DEF)
    t.add_tables(CLIENTS_DEF)
    return t


# -- parsing layer ---------------------------------------------------------


def test_create_table_parses():
    tdefs = parse_table_defs(FTPD_DEF)
    assert len(tdefs) == 1
    td = tdefs[0]
    assert td.name == "connections"
    assert len(td.patterns) == 1 and td.patterns[0].mode == "captures"
    assert [c.name for c in td.columns] == [
        "ip", "hostname", "year", "month", "day", "hour", "minute", "second",
    ]
    assert isinstance(td.columns[0].parsing, RegexCapture)
    assert td.columns[2].parsing.ref.group == 9  # year ← group 9


def test_create_table_split_inline_json_modifiers():
    td = parse_table_defs(r"""
    CREATE TABLE t(
        s = split ';',
        s[1] => ip TEXT TRIM,
        s[2] => year INT NOT NULL DEFAULT 2000,
        'x=(\\d+)' => x INT,
        { .a.b[2] } => ab REAL CONVERT
    );
    """)[0]
    assert td.patterns[0].mode == "split"
    assert td.columns[0].trim and td.columns[1].not_null
    assert td.columns[1].default == 2000
    assert td.patterns[1].name == "_pattern1"  # inline anonymous → group 1
    assert isinstance(td.columns[3].parsing, JsonPath)
    assert td.columns[3].parsing.path == ("a", "b", 2)
    assert td.columns[3].convert


def test_create_table_multigroup_timestamp():
    td = parse_table_defs(r"""
    CREATE TABLE t(
        line = '(\\d+)-(\\d+)-(\\d+)',
        line[1], line[2], line[3] => ts TIMESTAMP,
        line[1], line[2] => arr INT[]
    );
    """)[0]
    assert isinstance(td.columns[0].parsing, MultiRegex)
    assert len(td.columns[0].parsing.refs) == 3
    assert td.columns[0].vtype == TIMESTAMP
    assert td.columns[1].vtype.kind == "array"


def test_query_conversion_select_vs_aggregate():
    q = parse_query("SELECT a, b*2 AS bb FROM t WHERE a > 1 LIMIT 5")
    assert isinstance(q.plan, SelectPlan)
    assert [p.name for p in q.plan.projections] == ["a", "bb"]
    assert q.plan.limit == 5

    q2 = parse_query("SELECT a, COUNT(*) AS n FROM t GROUP BY a")
    assert isinstance(q2.plan, AggregatePlan)
    assert q2.plan.group_by[0].name == "a"
    assert q2.plan.aggs[0].func == "count_star"


def test_query_conversion_transform_and_having():
    q = parse_query(
        "SELECT a, SUM(x)*2 AS s2 FROM t GROUP BY a HAVING MAX(y) > 3 AND COUNT(*) > 1"
    )
    p = q.plan
    assert p.aggs[0].name == "s2" and p.aggs[0].func == "sum"
    assert p.aggs[0].transform is not None  # $value * 2
    # having-only aggregates got hidden slots
    hidden = [a for a in p.aggs if a.name.startswith("__having")]
    assert len(hidden) == 2


def test_projection_not_in_group_by_errors():
    with pytest.raises(SqlError):
        parse_query("SELECT a, b, COUNT(*) AS n FROM t GROUP BY a")


def test_too_many_aggregates_errors():
    with pytest.raises(SqlError):
        parse_query("SELECT MAX(x) + MIN(x) AS z FROM t GROUP BY a")


def test_group_by_expression():
    q = parse_query(
        "SELECT EXTRACT(hour FROM ts) AS h, COUNT(*) AS n FROM t GROUP BY EXTRACT(hour FROM ts)"
    )
    assert q.plan.group_by[0].name == "h"
    assert q.plan.group_by[0].expr.name == "timestamp_extract_hour"


def test_file_binding_and_case_in_cast():
    q = parse_query(
        "SELECT CASE WHEN a IN (1, 2) THEN 'x' ELSE 'y' END AS c, b::real AS r"
        " FROM t::'data.log' WHERE NOT (a IS NULL)"
    )
    assert q.file == "data.log"


# -- end-to-end over raw lines ---------------------------------------------


def test_ftpd_select_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT ip, hostname, day FROM connections WHERE hostname IS NOT NULL",
        source=FTPD_LINES,
    )
    assert len(rows) == 2  # empty-parens hostname is NULL, noise dropped
    assert all(r["ip"] == "82.68.222.194" for r in rows)


def test_ftpd_groupby_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT day, COUNT(*) AS n, MAX(minute) AS mm FROM connections GROUP BY day",
        source=FTPD_LINES,
    )
    assert rows == [
        {"day": 17, "n": 2, "mm": 7},
        {"day": 18, "n": 1, "mm": 58},
    ]


def test_ssh_group_count_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT hostname, COUNT(*) AS count FROM ssh GROUP BY hostname",
        source=SSH_LINES,
    )
    assert rows == [
        {"hostname": "other.example.net", "count": 1},
        {"hostname": "set.example.com", "count": 2},
    ]


def test_clients_json_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT device_id, events[1] AS first_event FROM clients WHERE device_id >= 160",
        source=CLIENT_LINES,
    )
    by_id = {r["device_id"]: r["first_event"] for r in rows}
    assert by_id == {167: "started", 200: None}


def test_wildcard_and_input_pseudocolumn(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT * FROM ssh LIMIT 10", source=SSH_LINES
    )
    assert len(rows) == 3
    assert set(rows[0].keys()) == {"hostname", "username"}
    rows2 = tables.execute_query_rows(
        "SELECT input FROM ssh WHERE username = 'guest'", source=SSH_LINES
    )
    assert len(rows2) == 1 and "rhost=other.example.net" in rows2[0]["input"]


DUMMY1_DEF = r"""
CREATE TABLE dummy1(
    line = 'hostname: ([a-z0-9.]+), min: (\\d+)',
    line[1] => hostname TEXT,
    line[2] => min INT
);
CREATE TABLE dummy2(
    line = 'hostname: ([a-z0-9.]+), max: (\\d+)',
    line[1] => hostname TEXT,
    line[2] => max INT
);
"""

DUMMY1_LINES = [
    "hostname: a.com, min: 1",
    "hostname: a.com, min: 2",
    "hostname: b.com, min: 3",
]
DUMMY2_LINES = [
    "hostname: a.com, max: 10",
    "hostname: c.com, max: 30",
]


def test_join_inner_and_outer_e2e(ray_session):
    t = Tables()
    t.add_tables(DUMMY1_DEF)
    # INNER: only a.com rows survive, 1:N fan-out (2 streamed × 1 stored)
    rows = t.execute_query_rows(
        "SELECT hostname, min, max FROM dummy1 INNER JOIN dummy2 ON dummy1.hostname = dummy2.hostname",
        source=DUMMY1_LINES,
        join_source=DUMMY2_LINES,
    )
    assert sorted((r["hostname"], r["min"], r["max"]) for r in rows) == [
        ("a.com", 1, 10),
        ("a.com", 2, 10),
    ]
    # OUTER (left): b.com kept with NULL max
    rows = t.execute_query_rows(
        "SELECT hostname, min, max FROM dummy1 FULL OUTER JOIN dummy2 ON dummy1.hostname = dummy2.hostname",
        source=DUMMY1_LINES,
        join_source=DUMMY2_LINES,
    )
    got = sorted([(r["hostname"], r["min"], r["max"]) for r in rows], key=str)
    assert got == sorted(
        [("a.com", 1, 10), ("a.com", 2, 10), ("b.com", 3, None)], key=str
    )


def test_join_under_aggregation_forces_inner(ray_session):
    """OUTER degrades to INNER under aggregation (execution_engine.rs:227-244)."""
    t = Tables()
    t.add_tables(DUMMY1_DEF)
    rows = t.execute_query_rows(
        "SELECT hostname, COUNT(*) AS n FROM dummy1 FULL OUTER JOIN dummy2 "
        "ON dummy1.hostname = dummy2.hostname GROUP BY hostname",
        source=DUMMY1_LINES,
        join_source=DUMMY2_LINES,
    )
    assert rows == [{"hostname": "a.com", "n": 2}]


def test_distinct_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT DISTINCT ip FROM connections", source=FTPD_LINES
    )
    assert sorted(r["ip"] for r in rows) == ["211.72.151.162", "82.68.222.194"]


def test_sql_transform_and_having_e2e(ray_session, tables):
    """Aggregate transform (SUM(x)*2 on $value) and HAVING with an
    unprojected aggregate, through the full SQL path."""
    rows = tables.execute_query_rows(
        "SELECT day, COUNT(*) * 2 AS n2, MAX(minute) AS mm FROM connections "
        "GROUP BY day HAVING MIN(hour) < 8",
        source=FTPD_LINES,
    )
    # day 17 has hours {7,7} → min 7 < 8 kept; day 18 hour 10 → dropped
    assert rows == [{"day": 17, "n2": 4, "mm": 7}]


def test_sql_case_and_cast_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT ip, CASE WHEN day >= 18 THEN 'late' ELSE 'early' END AS band, "
        "day::text AS day_s FROM connections",
        source=FTPD_LINES,
    )
    bands = {r["ip"]: (r["band"], r["day_s"]) for r in rows}
    assert bands["211.72.151.162"] == ("late", "18")
    assert bands["82.68.222.194"] == ("early", "17")


def test_sql_limit_on_aggregate_e2e(ray_session, tables):
    rows = tables.execute_query_rows(
        "SELECT day, COUNT(*) AS n FROM connections GROUP BY day LIMIT 1",
        source=FTPD_LINES,
    )
    assert rows == [{"day": 17, "n": 2}]  # sorted by key, first group
