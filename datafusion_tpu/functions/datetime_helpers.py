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
