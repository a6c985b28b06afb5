"""sources/pgwire.py unit surface (no server): literal rendering, %s
interpolation, and text-format decoding — the pieces whose bugs would
silently corrupt an upsert rather than fail loudly."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from database_synchronize_tool_spark.sources.pgwire import (
    _decode,
    _interpolate,
    _literal,
)


def test_literal_rendering():
    assert _literal(None) == "NULL"
    assert _literal(True) == "TRUE" and _literal(False) == "FALSE"
    assert _literal(42) == "42"
    assert _literal(2.5) == "2.5"
    assert _literal(Decimal("12.3400")) == "12.3400"
    assert _literal("o'brien") == "'o''brien'"
    assert _literal("plain") == "'plain'"
    assert _literal(b"\xde\xad") == "'\\xdead'::bytea"
    assert _literal(dt.date(2024, 3, 1)) == "'2024-03-01'"
    assert (
        _literal(dt.datetime(2024, 3, 1, 12, 34, 56, 789000))
        == "'2024-03-01 12:34:56.789000'"
    )
    assert _literal(["a", "it's"]) == "ARRAY['a', 'it''s']"


def test_interpolate_respects_placeholder_count():
    assert (
        _interpolate("INSERT INTO t VALUES (%s, %s)", (1, "x"))
        == "INSERT INTO t VALUES (1, 'x')"
    )
    with pytest.raises(ValueError):
        _interpolate("VALUES (%s, %s)", (1,))
    with pytest.raises(ValueError):
        _interpolate("VALUES (%s)", (1, 2))


def test_interpolate_never_reinterprets_injected_percent():
    # a VALUE containing %s must not create a new placeholder
    out = _interpolate("SELECT %s || %s", ("100%s", "x"))
    assert out == "SELECT '100%s' || 'x'"
    # and other % in the STATEMENT passes through untouched
    assert _interpolate("SELECT 7 % %s", (2,)) == "SELECT 7 % 2"


def test_decode_by_oid():
    assert _decode(20, "42") == 42  # int8
    assert _decode(23, "-7") == -7  # int4
    assert _decode(701, "2.5") == 2.5  # float8
    assert _decode(1700, "12.34") == Decimal("12.34")  # numeric
    assert _decode(16, "t") is True and _decode(16, "f") is False
    assert _decode(17, "\\xdeadbeef") == b"\xde\xad\xbe\xef"  # bytea
    assert _decode(25, "text stays text") == "text stays text"
    assert _decode(20, None) is None  # SQL NULL regardless of type


def test_literal_nonfinite_floats():
    assert _literal(float("nan")) == "'NaN'::float8"
    assert _literal(float("inf")) == "'Infinity'::float8"
    assert _literal(float("-inf")) == "'-Infinity'::float8"


def test_interpolate_percent_escape():
    # psycopg2 semantics: %% is a literal percent, usable next to %s
    assert (
        _interpolate("SELECT %s WHERE n LIKE 'a%%s'", ("v",))
        == "SELECT 'v' WHERE n LIKE 'a%s'"
    )
    assert _interpolate("SELECT '100%%'", ()) == "SELECT '100%'"


def test_copy_text_rendering():
    import datetime as dt
    from decimal import Decimal

    from database_synchronize_tool_spark.sources.pgwire import _copy_text

    assert _copy_text(None) == r"\N"
    assert _copy_text(True) == "t" and _copy_text(False) == "f"
    assert _copy_text(42) == "42"
    assert _copy_text(Decimal("1.50")) == "1.50"
    assert _copy_text(float("nan")) == "NaN"
    assert _copy_text(float("-inf")) == "-Infinity"
    assert _copy_text(dt.date(2024, 2, 29)) == "2024-02-29"
    assert _copy_text(b"\x00\xff") == "\\\\x00ff"
    assert _copy_text("a\tb\nc\\d") == "a\\tb\\nc\\\\d"
    import pytest

    with pytest.raises(ValueError, match="NUL"):
        _copy_text("bad\0value")


def test_check_scs_unknown_refuses_interpolation():
    # r11 advice: an ABSENT standard_conforming_strings (pre-8.2 server /
    # proxy that strips ParameterStatus) must refuse interpolation exactly
    # like an explicit off — unknown is not "on"
    from database_synchronize_tool_spark.sources.pgwire import Cursor, PgError

    class FakeConn:
        def __init__(self, status):
            self.parameter_status = status

    for status, ok in (
        ({}, False),
        ({"standard_conforming_strings": "off"}, False),
        ({"standard_conforming_strings": "on"}, True),
        ({"standard_conforming_strings": "ON"}, True),
    ):
        cur = Cursor.__new__(Cursor)
        cur._conn = FakeConn(status)
        if ok:
            cur._check_scs()
        else:
            with pytest.raises(PgError):
                cur._check_scs()


def test_nonfinite_decimal_literals():
    from decimal import Decimal

    from database_synchronize_tool_spark.sources.pgwire import _literal

    assert _literal(Decimal("NaN")) == "'NaN'::numeric"
    assert _literal(Decimal("Infinity")) == "'Infinity'::numeric"
    assert _literal(Decimal("-Infinity")) == "'-Infinity'::numeric"
    import pytest

    with pytest.raises(ValueError, match="NUL"):
        _literal("bad\0value")


def test_to_dollar_placeholder_rewrite():
    from database_synchronize_tool_spark.sources.pgwire import _to_dollar

    assert _to_dollar("INSERT INTO t VALUES (%s, %s)") == (
        "INSERT INTO t VALUES ($1, $2)", 2
    )
    assert _to_dollar("SELECT 1") == ("SELECT 1", 0)
    # %% stays a literal percent and never consumes a parameter slot
    assert _to_dollar("SELECT %s WHERE n LIKE 'a%%s'") == (
        "SELECT $1 WHERE n LIKE 'a%s'", 1
    )


def test_bind_text_rendering():
    import datetime as dt
    from decimal import Decimal

    from database_synchronize_tool_spark.sources.pgwire import _bind_text

    assert _bind_text(None) is None  # wire NULL (length -1), not a token
    assert _bind_text(True) == "t" and _bind_text(False) == "f"
    assert _bind_text(42) == "42"
    assert _bind_text(Decimal("12.3400")) == "12.3400"
    assert _bind_text(float("nan")) == "NaN"
    # NO quoting/escaping: the value is a protocol field, not SQL text
    assert _bind_text("o'brien; DROP TABLE x--") == "o'brien; DROP TABLE x--"
    assert _bind_text(b"\xde\xad") == "\\xdead"
    assert _bind_text(dt.date(2024, 3, 1)) == "2024-03-01"
    assert _bind_text(["a", 'q"t', None]) == '{"a","q\\"t",NULL}'
    assert _bind_text([]) == "{}"  # typable via Bind, unlike ARRAY[]
    import pytest

    with pytest.raises(ValueError, match="NUL"):
        _bind_text("bad\0value")


def test_parameterized_execute_never_interpolates(monkeypatch):
    # r11 verdict #7: the injection posture is 'never interpolated', not
    # 'escaped correctly' — any parameterized execute must route through
    # the extended protocol, so _interpolate/_literal must be unreachable
    from database_synchronize_tool_spark.sources import pgwire

    def boom(*a, **k):
        raise AssertionError("parameterized path touched the interpolator")

    monkeypatch.setattr(pgwire, "_interpolate", boom)
    monkeypatch.setattr(pgwire, "_literal", boom)

    calls = []

    class FakeConn:
        parameter_status = {}

        def _ensure_tx(self):
            pass

        def _query_ext(self, sql, batches):
            calls.append((sql, batches))
            return [], None, len(batches)

    cur = pgwire.Cursor.__new__(pgwire.Cursor)
    cur._conn = FakeConn()
    cur.execute("INSERT INTO t VALUES (%s)", ("x'; --",))
    cur.executemany("INSERT INTO t VALUES (%s)", [("a",), ("b",)])
    assert calls == [
        ("INSERT INTO t VALUES (%s)", [("x'; --",)]),
        ("INSERT INTO t VALUES (%s)", [("a",), ("b",)]),
    ]
