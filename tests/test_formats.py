"""Format library semantics (SURVEY §2.5; reference pkg/format/*.go).

Each case: (format, value, expected). Edge cases lifted from the reference's
implementation notes (leap seconds, IDN labels, [IPv6:…] email literals,
no-zone IPv6, calendar-checked dates)."""

import pyarrow as pa
import pytest

from jsonschema_ray import BatchValidator, parse_ruleset
from jsonschema_ray.formats import registry

CASES = [
    # date: real calendar check (pkg/format/time.go:45-96)
    ("date", "2024-02-29", True),
    ("date", "2023-02-29", False),
    ("date", "2024-13-01", False),
    ("date", "2024-1-01", False),
    ("date", "20240101", False),
    # time incl. leap second only at 23:59 UTC (time.go:99-207)
    ("time", "12:34:56Z", True),
    ("time", "12:34:56.789+05:30", True),
    ("time", "23:59:60Z", True),
    ("time", "12:34:60Z", False),
    ("time", "18:29:60+05:30", False),  # = 12:59:60 UTC
    ("time", "18:29:60-05:30", True),   # = 23:59:60 UTC
    ("time", "04:59:60-19:00", True),   # = 23:59:60 UTC
    ("time", "24:00:00Z", False),
    ("time", "12:00:00", False),
    ("date-time", "2024-06-01T12:00:00Z", True),
    ("date-time", "2024-06-01t12:00:00z", True),
    ("date-time", "2024-06-01 12:00:00Z", False),
    # duration (time.go:210-359)
    ("duration", "P1Y2M3DT4H5M6S", True),
    ("duration", "P4W", True),
    ("duration", "PT0S", True),
    ("duration", "P", False),
    ("duration", "PT", False),
    ("duration", "P1W2D", False),
    # email (email.go:16-121)
    ("email", "a.b@example.com", True),
    ("email", '"quoted local"@example.com', True),
    ("email", "user@[192.168.0.1]", True),
    ("email", "user@[IPv6:::1]", True),
    ("email", "no-at-sign", False),
    ("email", "a@under_score.com", False),
    # hostname (hostname.go:19-153)
    ("hostname", "example.com", True),
    ("hostname", "192.168.0.1", True),
    ("hostname", "a_b.example.com", False),
    ("hostname", "-leading.example.com", False),
    ("hostname", "a" * 64 + ".com", False),
    ("idn-hostname", "bücher.example", True),
    # ip (ip.go:15-38)
    ("ipv4", "192.168.0.1", True),
    ("ipv4", "256.1.1.1", False),
    ("ipv4", "::1", False),
    ("ipv6", "::1", True),
    ("ipv6", "fe80::1%eth0", False),  # no zone
    ("ipv6", "192.168.0.1", False),
    # uri (uri.go:25-123)
    ("uri", "https://example.com/a?b=c#d", True),
    ("uri", "relative/path", False),
    ("uri", "http://example.com/with space", False),
    ("uri-reference", "relative/path", True),
    ("uri-reference", "%zz-bad-escape", False),
    # uuid (uuid.go:14-82)
    ("uuid", "123e4567-e89b-12d3-a456-426614174000", True),
    ("uuid", "123E4567-E89B-12D3-A456-426614174000", True),
    ("uuid", "123e4567e89b12d3a456426614174000", False),
    # json-pointer (jsonpointer.go:15-85)
    ("json-pointer", "", True),
    ("json-pointer", "/a/b~0c/~1d", True),
    ("json-pointer", "/a/~2", False),
    ("json-pointer", "a/b", False),
    ("relative-json-pointer", "0", True),
    ("relative-json-pointer", "1/a/b", True),
    ("relative-json-pointer", "0#", True),
    ("relative-json-pointer", "01", False),
    # regex (regex.go:15-24)
    ("regex", "^a[bc]+$", True),
    ("regex", "a(", False),
]


@pytest.mark.parametrize("fmt,value,expected", CASES)
def test_format_rowwise(fmt, value, expected):
    assert registry[fmt](value) is expected, (fmt, value)


def test_format_keyword_vectorized():
    vals = ["123e4567-e89b-12d3-a456-426614174000", "nope", None]
    t = pa.table({"v": pa.array(vals)})
    rs = parse_ruleset({"properties": {"v": {"format": "uuid"}}})
    assert BatchValidator(rs).mask(t).tolist() == [True, False, True]
    # unknown formats always pass (validator.go:1247-1265)
    rs2 = parse_ruleset({"properties": {"v": {"format": "no-such-format"}}})
    assert BatchValidator(rs2).mask(t).tolist() == [True, True, True]
    # format checks off ⇒ no-op (ValidateOpts, schema.go:717-748)
    rs3 = parse_ruleset({"properties": {"v": {"format": "uuid"}}})
    bv = BatchValidator(rs3, validate_format=False)
    assert bv.mask(t).tolist() == [True, True, True]


def test_custom_format_hook():
    from jsonschema_ray import register_format
    register_format("even-length", lambda s: len(s) % 2 == 0)
    t = pa.table({"v": ["ab", "abc"]})
    rs = parse_ruleset({"properties": {"v": {"format": "even-length"}}})
    assert BatchValidator(rs).mask(t).tolist() == [True, False]
    registry.pop("even-length")


def test_format_unique_value_path_matches_rowwise():
    import numpy as np
    from jsonschema_ray import RowEvaluator
    rng = np.random.default_rng(7)
    pool = ["2024-02-29", "2023-02-29", "not a date", "2024-06-01", ""]
    vals = [str(rng.choice(pool)) for _ in range(200)]
    t = pa.table({"v": pa.array(vals)})
    rs = parse_ruleset({"properties": {"v": {"format": "date"}}})
    vm = BatchValidator(rs).mask(t).tolist()
    re_ = RowEvaluator(rs)
    rm = [len(re_.validate({"v": v})) == 0 for v in vals]
    assert vm == rm
