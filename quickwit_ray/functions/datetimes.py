"""Multi-format datetime parsing — the `quickwit-datetime` crate analog
(`date_time_format.rs:29-36`): input formats `iso8601 | rfc2822 |
rfc3339 (default) | strptime(...) | unix_timestamp` parsed to epoch
MICROseconds (the engine's internal timestamp unit; the reference stores
nanos — µs keeps Arrow timestamp[us] zero-copy).

unix_timestamp auto-detects the unit by magnitude the way the reference
does for its `unix_timestamp` input format (secs/millis/micros/nanos).
"""

from __future__ import annotations

from email.utils import parsedate_to_datetime
from typing import Iterable, Sequence

import numpy as np
import pandas as pd


def _unix_to_us(vals: pd.Series) -> np.ndarray:
    v = pd.to_numeric(vals, errors="coerce").astype("float64")
    out = np.full(len(v), np.nan)
    a = np.abs(v)
    secs = a < 1e11
    millis = (a >= 1e11) & (a < 1e14)
    micros = (a >= 1e14) & (a < 1e17)
    nanos = a >= 1e17
    out[secs] = v[secs] * 1e6
    out[millis] = v[millis] * 1e3
    out[micros] = v[micros]
    out[nanos] = v[nanos] / 1e3
    return out


def datetime_value_to_us(v) -> int:
    """Query-side coercion of ONE datetime bound/term to epoch µs.

    Numbers — including all-digit strings straight from the query-language
    parser, e.g. ``ts:>=1684993002`` — are unix timestamps with the unit
    auto-detected by magnitude (the reference's lenient
    `quickwit_datetime::parse_date_time_str`); anything else parses as a
    date string (rfc3339 and the common `2023/05/25`-style variants)."""
    if isinstance(v, str):
        t = v.strip()
        try:
            v = float(t) if ("." in t or "e" in t.lower()) else int(t)
        except ValueError:
            pass
    if isinstance(v, (int, float, np.integer, np.floating)):
        return int(_unix_to_us(pd.Series([v]))[0])
    return int(pd.Timestamp(v).value // 1000)


def parse_datetimes(values: Iterable, input_formats: Sequence[str] = ("rfc3339",)
                    ) -> np.ndarray:
    """Parse a column of datetime-ish values to epoch µs (float64 with NaN
    for unparseable). Formats are tried in order per the reference."""
    s = pd.Series(list(values))
    out = np.full(len(s), np.nan)
    remaining = np.ones(len(s), bool)
    for fmt in input_formats:
        if not remaining.any():
            break
        sub = s[remaining]
        if fmt in ("rfc3339", "iso8601"):
            parsed = pd.to_datetime(sub, errors="coerce", utc=True,
                                    format="ISO8601")
            # ns -> us by INTEGER division before any float conversion:
            # int64 ns (~1.4e18) is not float64-exact and a float divide
            # corrupts sub-ms fractions (.002 -> .001999750)
            vals = (np.asarray(parsed.astype("int64")) // 1000).astype(np.float64)
            ok = parsed.notna().to_numpy()
        elif fmt == "rfc2822":
            def _p(x):
                try:
                    return parsedate_to_datetime(str(x)).timestamp() * 1e6
                except (TypeError, ValueError):
                    return np.nan
            vals = np.asarray([_p(x) for x in sub])
            ok = ~np.isnan(vals)
        elif fmt == "unix_timestamp":
            vals = _unix_to_us(sub)
            ok = ~np.isnan(vals)
        elif fmt.startswith("strptime:"):
            pat = fmt.split(":", 1)[1]
            parsed = pd.to_datetime(sub, errors="coerce", utc=True, format=pat)
            vals = (np.asarray(parsed.astype("int64")) // 1000).astype(np.float64)
            ok = parsed.notna().to_numpy()
        else:
            raise ValueError(f"unknown datetime input format {fmt!r}")
        idx = np.nonzero(remaining)[0]
        out[idx[ok]] = np.asarray(vals)[ok]
        remaining[idx[ok]] = False
    return out
