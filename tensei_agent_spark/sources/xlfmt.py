"""Excel number-format classification + rendering for staged cells.

The reference converts workbooks with POI's ``DataFormatter`` and then
OVERRIDES two families before writing the staged CSV
(``helpers/ExcelToCSVConverter.scala:300-370``):

- date-formatted cells → ``java.sql.Date.toString`` (ISO yyyy-MM-dd);
  a combined date+time format also lands in this branch, so the time
  part is dropped — a reference quirk we reproduce;
- time-formatted cells → parsed back and rendered as a time-of-day.

Everything else goes through the DataFormatter. Of those, the only
format family the reference's fixtures rely on is PERCENT ("0.00%" →
"0.50%", re-parsed downstream by a formatnum element,
``ExcelToCSVConverterTest.scala:316-330`` expects 0.50 for a stored
0.005). Currency/accounting formats are left as raw numbers — no
fixture exercises them and the locale-decorated strings would only be
stripped again by formatnum.

One deliberate divergence: time cells render LocalTime-style (zero
seconds omitted, "23:01") instead of ``java.sql.Time.toString``
("23:01:00"). The reference's PARSER turns the staged text into a
LocalTime whose final written form drops zero seconds anyway
(``usecases/copy/excel/minimal-expected.csv`` line 3); rendering it at
the converter keeps ``time`` columns plain strings end-to-end.
"""

from __future__ import annotations

import datetime as dt
import re

# Builtin ifmt classes (BIFF8 / OOXML shared ids). 0x16 (22) is the
# combined date+time builtin — classified "date" on purpose (see above).
_BUILTIN_DATE = {14, 15, 16, 17, 22, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 50, 51, 52, 53, 54, 55, 56, 57, 58}
_BUILTIN_TIME = {18, 19, 20, 21, 45, 46, 47}
_BUILTIN_PERCENT = {9: 0, 10: 2}

# Strip the non-token parts of a custom format before classification:
# quoted literals, [..] color/locale/elapsed prefixes, backslash
# escapes, and the _x / *x fill directives.
_NOISE = re.compile(r'"[^"]*"|\[[^\]]*\]|\\.|_.|\*.')


def classify(ifmt: int, fmt: str | None) -> str | None:
    """'date' | 'time' | 'percent' | None (plain numeric) for a cell's
    number format. Mirrors POI ``DateUtil.isADateFormat`` closely enough
    for the reference corpus: after stripping literals, a format whose
    tokens include d/y (or m next to nothing time-ish) is a date; h/s
    (or m in a clock context) alone is a time; '%' is a percent.
    """
    if ifmt in _BUILTIN_DATE:
        return "date"
    if ifmt in _BUILTIN_TIME:
        return "time"
    if ifmt in _BUILTIN_PERCENT:
        return "percent"
    if not fmt or fmt.lower() == "general":
        return None
    body = _NOISE.sub("", fmt.split(";", 1)[0]).lower()
    if "%" in body:
        return "percent"
    has_dy = bool(re.search(r"[dy]", body))
    has_hs = bool(re.search(r"[hs]", body))
    has_m = "m" in body
    if has_dy:
        return "date"  # date, or datetime → reference's date branch
    if has_hs or (has_m and ":" in body):
        return "time"
    return None


def percent_decimals(ifmt: int, fmt: str | None) -> int:
    if ifmt in _BUILTIN_PERCENT:
        return _BUILTIN_PERCENT[ifmt]
    body = _NOISE.sub("", (fmt or "").split(";", 1)[0])
    m = re.search(r"\.([0#]+)", body)
    return len(m.group(1)) if m else 0


_EPOCH = dt.date(1899, 12, 30)


def serial_date(value: float) -> dt.date:
    """Excel 1900-system serial → date. Serials below 60 predate the
    fictitious 1900-02-29, so the effective epoch shifts by one day
    (POI ``DateUtil.getJavaDate``)."""
    days = int(value)
    if days < 60:
        days += 1
    return _EPOCH + dt.timedelta(days=days)


def render(value: float, kind: str, ifmt: int = 0, fmt: str | None = None) -> str:
    if kind == "date":
        return serial_date(value).isoformat()
    if kind == "time":
        secs = int(round((value % 1.0) * 86400)) % 86400
        h, rem = divmod(secs, 3600)
        m, s = divmod(rem, 60)
        # LocalTime-style: zero seconds omitted (divergence note above)
        return f"{h:02d}:{m:02d}:{s:02d}" if s else f"{h:02d}:{m:02d}"
    if kind == "percent":
        return f"{value * 100:.{percent_decimals(ifmt, fmt)}f}%"
    raise ValueError(f"unknown render kind {kind!r}")
