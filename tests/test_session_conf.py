"""The JIRLBOT_SPARK_CONF deployment hook: env-injected session confs.

Parsing is a pure function (session.parse_env_conf) so the contract is
testable without a JVM; get_spark applies the parsed dict before
extra_conf, so programmatic callers always win over the environment.
"""

from __future__ import annotations

from jirlbot_spark.session import parse_env_conf


def test_parse_basic():
    assert parse_env_conf(
        "spark.sql.parquet.compression.codec=snappy;spark.foo=1"
    ) == {"spark.sql.parquet.compression.codec": "snappy", "spark.foo": "1"}


def test_parse_whitespace_and_stray_semicolons():
    assert parse_env_conf(" a = 1 ;; b=2 ; ") == {"a": "1", "b": "2"}


def test_parse_value_containing_equals():
    # only the FIRST '=' splits: java options etc. keep their '='
    assert parse_env_conf("spark.x=-Da=b,-Dc=d") == {
        "spark.x": "-Da=b,-Dc=d"
    }


def test_parse_drops_incomplete_entries():
    # truncated env vars must not half-apply
    assert parse_env_conf("a=1;broken;=2;c=;  ;d=4") == {"a": "1", "d": "4"}


def test_parse_empty():
    assert parse_env_conf("") == {}
