"""Interval packing.

The device representation of INTERVAL is one int64 (see
`common/datatypes.py`). The reference uses arrow's MonthDayNano i128
(`datafusion/common/src/scalar/mod.rs` Interval variants); on TPU we pack
(months, days, millis) into 64 bits with offset-binary fields so the value
is a single lane word:

    bits [47..63] months + 2^15   (±32767 months)
    bits [27..46] days   + 2^19   (±524287 days)
    bits [ 0..26] millis + 2^26   (±18.6 hours within-day component)

Sub-millisecond interval components are not representable; interval
arithmetic kernels unpack, operate componentwise, repack.
"""
from __future__ import annotations

import numpy as np

_M_OFF = 1 << 15
_D_OFF = 1 << 19
_MS_OFF = 1 << 26
_D_SHIFT = 27
_M_SHIFT = 47


def pack_interval(months: int, days: int, nanos: int) -> int:
    millis = int(nanos) // 1_000_000
    return (((int(months) + _M_OFF) << _M_SHIFT)
            | ((int(days) + _D_OFF) << _D_SHIFT)
            | (millis + _MS_OFF))


def pack_interval_np(months, days, millis):
    months = np.asarray(months, np.int64)
    days = np.asarray(days, np.int64)
    millis = np.asarray(millis, np.int64)
    return (((months + _M_OFF) << _M_SHIFT)
            | ((days + _D_OFF) << _D_SHIFT)
            | (millis + _MS_OFF))


def unpack_interval_np(packed):
    packed = np.asarray(packed, np.int64)
    months = (packed >> _M_SHIFT) - _M_OFF
    days = ((packed >> _D_SHIFT) & ((1 << 20) - 1)) - _D_OFF
    millis = (packed & ((1 << 27) - 1)) - _MS_OFF
    return months, days, millis


def interval_str(packed: int) -> str:
    m, d, ms = unpack_interval_np(np.array([packed]))
    m, d, ms = int(m[0]), int(d[0]), int(ms[0])
    parts = []
    if m:
        parts.append(f"{m} mons")
    if d:
        parts.append(f"{d} days")
    if ms or not parts:
        secs = ms / 1000.0
        parts.append(f"{secs:g} secs")
    return " ".join(parts)


# --------------------------------------------------------------------------
# Exact (integer) temporal string parsing and chrono-style formatting.
#
# The reference's timestamp text round-trip is exact at nanosecond precision
# (arrow-cast string_to_timestamp_nanos + chrono Debug formatting); a float64
# path loses the low ~3 digits of a modern epoch-nanos value, so everything
# here is integer arithmetic.
# --------------------------------------------------------------------------
import datetime as _dt
import re as _re

_EPOCH_ORD = _dt.date(1970, 1, 1).toordinal()
_TS_RE = _re.compile(
    r"^(\d{4,5})-(\d{1,2})-(\d{1,2})"
    r"(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?"
    r"\s*(Z|z|[+-]\d{1,2}:?\d{2})?)?$")
_TIME_RE = _re.compile(r"^(\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?$")
UNIT_NS = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}


def parse_timestamp_ns(s: str) -> int:
    """Parse a timestamp string to UTC epoch nanoseconds, exactly.

    Accepts 'YYYY-MM-DD[ T]HH:MM[:SS[.frac]][Z|±HH:MM]' and bare dates.
    Reference: arrow string_to_timestamp_nanos (used by cast and literals).
    """
    m = _TS_RE.match(s.strip())
    if not m:
        raise ValueError(f"invalid timestamp string {s!r}")
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    days = _dt.date(y, mo, d).toordinal() - _EPOCH_ORD
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    frac = (m.group(7) or "").ljust(9, "0")[:9]
    secs = days * 86400 + hh * 3600 + mi * 60 + ss
    tz = m.group(8)
    if tz and tz not in ("Z", "z"):
        sign = 1 if tz[0] == "+" else -1
        tz = tz[1:].replace(":", "")
        off_h, off_m = int(tz[:-2]), int(tz[-2:])
        secs -= sign * (off_h * 3600 + off_m * 60)
    return secs * 10**9 + int(frac)


def parse_time_ns(s: str) -> int:
    """Parse 'HH:MM[:SS[.frac]]' to nanoseconds since midnight, exactly."""
    m = _TIME_RE.match(s.strip())
    if not m:
        raise ValueError(f"invalid time string {s!r}")
    hh, mi = int(m.group(1)), int(m.group(2))
    ss = int(m.group(3) or 0)
    if hh > 23 or mi > 59 or ss > 59:
        raise ValueError(f"time value out of range: {s!r}")
    frac = (m.group(4) or "").ljust(9, "0")[:9]
    return (hh * 3600 + mi * 60 + ss) * 10**9 + int(frac)


def _frac_str(frac_ns: int) -> str:
    """chrono's AutoSi fractional display: 0, 3, 6 or 9 digits."""
    if frac_ns == 0:
        return ""
    if frac_ns % 1_000_000 == 0:
        return f".{frac_ns // 1_000_000:03d}"
    if frac_ns % 1_000 == 0:
        return f".{frac_ns // 1_000:06d}"
    return f".{frac_ns:09d}"


def format_timestamp(value: int, unit: str, tz=None) -> str:
    """Format an epoch value in `unit` the way chrono Debug does
    ('2018-11-13T17:11:10.011375885'); tz-typed values render in their
    zone with the RFC3339 offset suffix (Z for +00)."""
    ns = int(value) * UNIT_NS[unit]
    suffix = ""
    if tz is not None:
        from .tz_util import offset_suffix, offsets_for_utc_ns
        off = int(offsets_for_utc_ns(tz, np.array([ns], np.int64))[0])
        ns += off
        suffix = offset_suffix(off)
    secs, frac = divmod(ns, 10**9)
    days, sod = divmod(secs, 86400)
    y, mo, d = _civil_from_days(days)
    base = (f"{'' if 0 <= y <= 9999 else '+' if y > 0 else ''}"
            f"{y:04d}-{mo:02d}-{d:02d}"
            f"T{sod // 3600:02d}:{sod // 60 % 60:02d}:{sod % 60:02d}"
            + _frac_str(frac))
    return base + suffix


def format_time(value: int, unit: str) -> str:
    """'18:06:30.243620451' — chrono NaiveTime Debug formatting."""
    ns = int(value) * UNIT_NS[unit]
    sod, frac = divmod(ns, 10**9)
    return f"{sod // 3600:02d}:{sod // 60 % 60:02d}:{sod % 60:02d}" + _frac_str(frac)


def interval_display(packed: int, style: str = "mdn") -> str:
    """arrow's full Interval Display: 'X years Y mons Z days H hours M mins
    S.fff secs', with 9/3/2 fractional digits for MonthDayNano/DayTime/
    YearMonth (arrow-rs interval array Display)."""
    if style.startswith("rawdur"):
        # raw-nanosecond Duration (exact ts - ts): truncate-toward-zero
        # decomposition like arrow's Duration display
        ns = int(packed)
        digits = {"rawdur_ns": 9, "rawdur_us": 6,
                  "rawdur_ms": 3, "rawdur_s": 0}.get(style, 9)
        sign = -1 if ns < 0 else 1
        a = abs(ns)
        days, rem = divmod(a, 86_400 * 10**9)
        hours, rem = divmod(rem, 3_600 * 10**9)
        mins, rem = divmod(rem, 60 * 10**9)
        secs, frac = divmod(rem, 10**9)
        neg = "-" if sign < 0 else ""
        stxt = f"{neg if (secs or frac) else ''}{secs}"
        if digits:
            stxt += "." + f"{frac:09d}"[:digits]
        return (f"{neg if days else ''}{days} days "
                f"{neg if hours else ''}{hours} hours "
                f"{neg if mins else ''}{mins} mins {stxt} secs")
    m, d, ms = unpack_interval_np(np.array([packed]))
    m, d, ms = int(m[0]), int(d[0]), int(ms[0])
    years = int(m / 12)            # truncate toward zero
    mons = m - years * 12
    hours = int(ms / 3_600_000)
    rem = ms - hours * 3_600_000
    mins = int(rem / 60_000)
    rem -= mins * 60_000
    secs = int(rem / 1000)
    frac_ms = abs(rem - secs * 1000)
    digits = {"mdn": 9, "dt": 3, "ym": 2, "dur_ns": 9, "dur_us": 6,
              "dur_ms": 3, "dur_s": 0, "dur_day": 0}.get(
        style, 3 if style.startswith("dur") else 9)
    frac = str(frac_ms).zfill(3).ljust(digits, "0")[:digits]
    sign = "-" if (rem < 0 and secs == 0) else ""
    sec_txt = f"{sign}{secs}.{frac}" if digits else f"{sign}{secs}"
    tail = (f"{d} days {hours} hours {mins} mins {sec_txt} secs")
    if style.startswith("dur"):
        # arrow Duration display carries no years/mons component
        return tail
    return f"{years} years {mons} mons " + tail


def _civil_from_days(z: int):
    """Proleptic Gregorian (year, month, day) from days since 1970-01-01 —
    valid for any year, unlike datetime.date (Howard Hinnant's civil_from_days)."""
    z += 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    return (y + 1 if m <= 2 else y), m, d
