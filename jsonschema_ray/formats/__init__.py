"""Format validator registry — the analog of the reference's format library
(pkg/format/format.go:17-45: 18 built-ins registered at import + a public
custom-format hook routed through validator.go:1237-1244).

Each validator is ``fn(s: str) -> bool``. Non-string instances are skipped by
the `format` keyword itself (every reference format validator returns nil for
non-strings). Unknown formats always pass (validator.go:1247-1265).

Vectorization: the batch engine applies these over the DISTINCT values of a
batch column (pyarrow unique → python fn → index_in scatter), so a per-row
Python function is fine even in hot stages; formats with a cheap full-regex
form also expose a compiled regex via VECTOR_REGEX for the pure-Arrow path.
"""

from __future__ import annotations

import ipaddress
import re
from datetime import datetime
from typing import Callable, Optional
from urllib.parse import urlsplit

registry: dict[str, Callable[[str], bool]] = {}

# formats whose acceptance is exactly a regex match — usable directly with
# pyarrow.compute.match_substring_regex (RE2, same engine family as Go's)
VECTOR_REGEX: dict[str, str] = {}


def register_format(name: str, fn: Callable[[str], bool],
                    vector_regex: Optional[str] = None) -> None:
    """Public custom-format hook (RegisterFormatValidator analog,
    pkg/format/format.go:43-45)."""
    registry[name] = fn
    if vector_regex is not None:
        VECTOR_REGEX[name] = vector_regex


# ---------------------------------------------------------------------------
# date / time / date-time / duration (pkg/format/time.go)

_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})\Z")


def is_date(s: str) -> bool:
    """RFC3339 full-date with real calendar check (time.Date round-trip,
    pkg/format/time.go:45-96)."""
    m = _DATE_RE.match(s)
    if not m:
        return False
    y, mo, d = (int(x) for x in m.groups())
    try:
        datetime(y, mo, d)
    except ValueError:
        return False
    return True


_TIME_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?([zZ]|[+-]\d{2}:\d{2})\Z")


def is_time(s: str) -> bool:
    """RFC3339 full-time incl. leap-second ':60' allowed only when the
    UTC-normalized time is 23:59 (pkg/format/time.go:99-207)."""
    m = _TIME_RE.match(s)
    if not m:
        return False
    hh, mm, ss = int(m.group(1)), int(m.group(2)), int(m.group(3))
    off = m.group(5)
    if hh > 23 or mm > 59 or ss > 60:
        return False
    if off not in ("z", "Z"):
        oh, om = int(off[1:3]), int(off[4:6])
        if oh > 23 or om > 59:
            return False
    if ss == 60:
        # convert to UTC and require 23:59 (time.go:162-204)
        if off in ("z", "Z"):
            uh, um = hh, mm
        else:
            sign = -1 if off[0] == "+" else 1
            total = hh * 60 + mm + sign * (int(off[1:3]) * 60 + int(off[4:6]))
            total %= 24 * 60
            uh, um = divmod(total, 60)
        if (uh, um) != (23, 59):
            return False
    return True


def is_datetime(s: str) -> bool:
    """date 'T'/'t' time (pkg/format/time.go:16-42)."""
    for sep in ("T", "t"):
        if sep in s:
            d, _, t = s.partition(sep)
            return is_date(d) and is_time(t)
    return False


# ISO-8601 duration grammar (hand-rolled in the reference,
# pkg/format/time.go:210-359): P[nW] | P[nY][nM][nD][T[nH][nM][nS]]
_DUR_RE = re.compile(
    r"^P(?:\d+W|(?=\d|T\d)(?:\d+Y)?(?:\d+M)?(?:\d+D)?"
    r"(?:T(?=\d)(?:\d+H)?(?:\d+M)?(?:\d+S)?)?)\Z")


def is_duration(s: str) -> bool:
    return bool(_DUR_RE.match(s))


# ---------------------------------------------------------------------------
# email / hostname / ip (pkg/format/email.go, hostname.go, ip.go)

_EMAIL_LOCAL_RE = re.compile(
    r'^(?:[A-Za-z0-9!#$%&\'*+/=?^_`{|}~-]+(?:\.[A-Za-z0-9!#$%&\'*+/=?^_`{|}~-]+)*'
    r'|"(?:[^"\\\r\n]|\\.)*")\Z')


def _hostname_ok(s: str, idn: bool) -> bool:
    """IP literals pass; underscores rejected; labels ≤63, total ≤253
    (pkg/format/hostname.go:19-153)."""
    if not s:
        return False
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        pass
    if len(s.rstrip(".")) > 253:
        return False
    labels = s.rstrip(".").split(".")
    for label in labels:
        if not label or len(label) > 63:
            return False
        if idn:
            try:
                label = label.encode("idna").decode("ascii") \
                    if not label.isascii() else label
            except UnicodeError:
                return False
        if not label.isascii():
            return False
        if not re.match(r"^[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?\Z", label):
            return False
    return True


def is_hostname(s: str) -> bool:
    return _hostname_ok(s, idn=False)


def is_idn_hostname(s: str) -> bool:
    return _hostname_ok(s, idn=True)


def _email_ok(s: str, idn: bool) -> bool:
    """local@domain; domain is hostname or [IP] literal
    (pkg/format/email.go:16-121)."""
    if "@" not in s:
        return False
    local, _, domain = s.rpartition("@")
    if not local or not domain:
        return False
    if not _EMAIL_LOCAL_RE.match(local):
        return False
    if domain.startswith("[") and domain.endswith("]"):
        lit = domain[1:-1]
        if lit.startswith("IPv6:"):  # email.go:98 rewrite
            lit = lit[5:]
        try:
            ipaddress.ip_address(lit)
            return True
        except ValueError:
            return False
    return _hostname_ok(domain, idn=idn)


def is_email(s: str) -> bool:
    return _email_ok(s, idn=False)


def is_idn_email(s: str) -> bool:
    return _email_ok(s, idn=True)


def is_ipv4(s: str) -> bool:
    """netip.ParseAddr + Is4 analog (pkg/format/ip.go:15-38): dotted quad,
    no leading zeros."""
    try:
        addr = ipaddress.ip_address(s)
    except ValueError:
        return False
    return addr.version == 4


def is_ipv6(s: str) -> bool:
    if "%" in s:  # no zone (ip.go:15-38)
        return False
    try:
        addr = ipaddress.ip_address(s)
    except ValueError:
        return False
    return addr.version == 6


# ---------------------------------------------------------------------------
# uri family (pkg/format/uri.go:25-123)

_URI_BAD_CHARS = re.compile(r'[\x00-\x20<>"{}|\\^`\x7f]')


def _uri_ok(s: str, require_scheme: bool) -> bool:
    if _URI_BAD_CHARS.search(s):
        return False
    try:
        parts = urlsplit(s)
    except ValueError:
        return False
    if require_scheme:
        if not parts.scheme or not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*\Z",
                                            parts.scheme):
            return False
    # no bare (unbracketed) IPv6 host (uri.go:91-123)
    host = parts.netloc.rpartition("@")[2]
    if host.count(":") > 1 and not host.startswith("["):
        return False
    if "%" in s:
        # percent-escapes must be well-formed
        if re.search(r"%(?![0-9A-Fa-f]{2})", s):
            return False
    return True


def is_uri(s: str) -> bool:
    return _uri_ok(s, require_scheme=True)


def is_uri_reference(s: str) -> bool:
    return _uri_ok(s, require_scheme=False)


# ---------------------------------------------------------------------------
# uuid / json-pointer / regex (pkg/format/uuid.go, jsonpointer.go, regex.go)

_UUID_PATTERN = (r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-"
                 r"[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$")
# Python `$` also matches before a trailing '\n'; RE2 (the vector path)
# treats `$` as end-of-text.  Compile the row-wise side with `\Z` so both
# engines reject 'value\n' identically.
_UUID_RE = re.compile(_UUID_PATTERN[:-1] + r"\Z")


def is_uuid(s: str) -> bool:
    return bool(_UUID_RE.match(s))


_JP_PATTERN = r"^(?:/(?:[^~]|~[01])*)*$"
_JP_RE = re.compile(_JP_PATTERN[:-1] + r"\Z")


def is_json_pointer(s: str) -> bool:
    return bool(_JP_RE.match(s))


_RJP_RE = re.compile(r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~]|~[01])*)*)\Z")


def is_relative_json_pointer(s: str) -> bool:
    return bool(_RJP_RE.match(s))


def is_regex(s: str) -> bool:
    """regexp/syntax.Parse validity analog (pkg/format/regex.go:15-24)."""
    try:
        re.compile(s)
        return True
    except re.error:
        return False


# ---------------------------------------------------------------------------
# registration (format.go:17-36 analog)

for _name, _fn, _rex in [
    ("date", is_date, None),
    ("time", is_time, None),
    ("date-time", is_datetime, None),
    ("duration", is_duration, None),
    ("email", is_email, None),
    ("idn-email", is_idn_email, None),
    ("hostname", is_hostname, None),
    ("idn-hostname", is_idn_hostname, None),
    ("ipv4", is_ipv4, None),
    ("ipv6", is_ipv6, None),
    ("uri", is_uri, None),
    ("uri-reference", is_uri_reference, None),
    ("iri", is_uri, None),
    ("iri-reference", is_uri_reference, None),
    ("uuid", is_uuid, _UUID_PATTERN),
    ("json-pointer", is_json_pointer, _JP_PATTERN),
    ("relative-json-pointer", is_relative_json_pointer, None),
    ("regex", is_regex, None),
]:
    register_format(_name, _fn, _rex)
