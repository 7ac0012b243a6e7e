"""Minimal BIFF8 (legacy ``.xls``) workbook reader on the stdlib.

Reference parity: ``helpers/ExcelToCSVConverter.scala:42-150`` converts
``.xls`` with Apache POI before CSV staging; this module implements the
same read natively so the legacy path needs no optional dependency,
mirroring the zip+XML approach of the ``.xlsx`` reader next door:

- OLE2 compound document (512-byte header, DIFAT→FAT chains, directory,
  mini-stream for sub-cutoff streams) → the ``Workbook``/``Book``
  stream;
- BIFF8 record walk: BOUNDSHEET offsets → per-sheet substream; cell
  records SST/LABELSST, NUMBER, RK, MULRK, LABEL, BOOLERR,
  FORMULA (+ cached STRING), BLANK/MULBLANK;
- SST continuation handling: strings split across CONTINUE records
  re-read the compression flag byte at each record boundary (the one
  genuinely fiddly rule of the format).

Output contract matches :func:`..excel.read_xlsx_rows`: shared strings
resolved, booleans as TRUE/FALSE, error cells as their Excel display
text, numbers rendered trailing-``.0``-free, blank/missing cells ``""``,
empty rows preserved by position.
"""

from __future__ import annotations

import struct

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# BIFF record opcodes
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABEL = 0x0204
_RSTRING = 0x00D6
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_FORMAT = 0x041E
_XF = 0x00E0

_ERROR_TEXT = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A",
}


def _ole_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract one stream from an OLE2 compound document."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE2 compound document (.xls)")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    (dir_start,) = struct.unpack_from("<i", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (minifat_start,) = struct.unpack_from("<i", data, 60)
    (difat_start,) = struct.unpack_from("<i", data, 68)
    per = ssz // 4

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        return data[off : off + ssz]

    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    while s >= 0:
        ent = struct.unpack(f"<{per}i", sector(s))
        difat.extend(ent[:-1])
        s = ent[-1]
    fat: list[int] = []
    for fs in [x for x in difat if x >= 0][:n_fat]:
        fat.extend(struct.unpack(f"<{per}i", sector(fs)))

    def chain(start: int, table: list[int]) -> list[int]:
        out: list[int] = []
        seen: set[int] = set()
        s = start
        while s >= 0:
            if s in seen or s >= len(table):
                raise ValueError("corrupt sector chain")
            seen.add(s)
            out.append(s)
            s = table[s]
        return out

    dirdata = b"".join(sector(s) for s in chain(dir_start, fat))
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off : off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        if not 2 <= nlen <= 64:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "replace")
        etype = e[66]
        (start,) = struct.unpack_from("<i", e, 116)
        (size,) = struct.unpack_from("<I", e, 120)
        entries.append((name, etype, start, size))

    root = next(e for e in entries if e[1] == 5)
    target = next(
        (e for e in entries if e[1] == 2 and e[0] in names), None
    )
    if target is None:
        raise ValueError(f"no {'/'.join(names)} stream in compound document")
    _, _, start, size = target
    if size >= mini_cutoff:
        return b"".join(sector(s) for s in chain(start, fat))[:size]
    # Sub-cutoff streams live in the root entry's mini stream, chained
    # through the miniFAT in 64-byte (1<<mini_shift) mini sectors.
    ministream = b"".join(sector(s) for s in chain(root[2], fat))[: root[3]]
    minifat: list[int] = []
    if minifat_start >= 0:
        for ms in chain(minifat_start, fat):
            minifat.extend(struct.unpack(f"<{per}i", sector(ms)))
    out = []
    for s in chain(start, minifat):
        out.append(ministream[s * mssz : (s + 1) * mssz])
    return b"".join(out)[:size]


def _records(stream: bytes, pos: int = 0):
    """Yield (offset, opcode, payload) BIFF records from ``pos``."""
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, op, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


class _SSTCursor:
    """Byte cursor over an SST record plus its CONTINUE payloads.

    Fixed-width fields never split across records (writers keep them
    whole); character data DOES split, and each continuation restarts
    with a fresh compression-flag byte — ``read_chars`` re-reads it at
    every boundary crossed mid-string.
    """

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.i = 0
        self.o = 0

    def _advance(self) -> None:
        while self.i < len(self.chunks) and self.o >= len(self.chunks[self.i]):
            self.i += 1
            self.o = 0

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            self._advance()
            chunk = self.chunks[self.i]
            take = min(n, len(chunk) - self.o)
            out += chunk[self.o : self.o + take]
            self.o += take
            n -= take
        return out

    def read_chars(self, cch: int, high: bool) -> str:
        out = []
        while cch > 0:
            self._advance()
            chunk = self.chunks[self.i]
            if self.o >= len(chunk):
                raise ValueError("truncated SST string")
            avail = len(chunk) - self.o
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:
                # Boundary reached: next chunk begins with a new flag.
                self.i += 1
                self.o = 0
                self._advance()
                high = bool(self.read(1)[0] & 0x01)
                continue
            raw = chunk[self.o : self.o + take * width]
            self.o += take * width
            out.append(
                raw.decode("utf-16-le" if high else "latin-1", "replace")
            )
            cch -= take
            if cch > 0:
                # String continues in the next record: flag byte first.
                self.i += 1
                self.o = 0
                self._advance()
                high = bool(self.read(1)[0] & 0x01)
        return "".join(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        high = bool(grbit & 0x01)
        n_runs = struct.unpack("<H", self.read(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<i", self.read(4))[0] if grbit & 0x04 else 0
        s = self.read_chars(cch, high)
        self.read(4 * n_runs + max(cb_ext, 0))  # formatting runs + phonetic
        return s


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _SSTCursor(chunks)
    cur.read(4)  # total refs
    (n,) = struct.unpack("<I", cur.read(4))
    return [cur.read_string() for _ in range(n)]


def _unicode_inline(payload: bytes, off: int) -> str:
    """XLUnicodeString embedded in a single record (LABEL/STRING)."""
    cch, grbit = struct.unpack_from("<HB", payload, off)
    off += 3
    if grbit & 0x08:
        off += 2
    if grbit & 0x04:
        off += 4
    if grbit & 0x01:
        return payload[off : off + 2 * cch].decode("utf-16-le", "replace")
    return payload[off : off + cch].decode("latin-1", "replace")


def _rk_value(rk: int) -> float:
    if rk & 0x02:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        val = float(v)
    else:  # high 30 bits of an IEEE double
        (val,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    return val / 100.0 if rk & 0x01 else val


def _num_str(d: float) -> str:
    """Match the ``.xlsx`` reader's number rendering: integral doubles
    lose the trailing .0, everything else is the shortest round-trip."""
    if d == int(d) and abs(d) < 1e16:
        return str(int(d))
    return repr(d)


def read_xls_rows(path: str, sheet: str | int = 0) -> list[list[str]]:
    """Read one worksheet of a BIFF8 ``.xls`` → dense string grid."""
    with open(path, "rb") as fh:
        data = fh.read()
    stream = _ole_stream(data, ("Workbook", "Book"))

    # Workbook-globals pass: sheet directory + shared strings + number
    # formats (FORMAT: ifmt → pattern; XF: cell-style index → ifmt) for
    # the reference converter's date/time/percent renderings (xlfmt).
    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    sst: list[str] = []
    sst_chunks: list[bytes] | None = None
    formats: dict[int, str] = {}
    xf_ifmt: list[int] = []
    for _, op, payload in _records(stream):
        if op == _FORMAT:
            (ifmt,) = struct.unpack_from("<H", payload, 0)
            formats[ifmt] = _unicode_inline(payload, 2)
        elif op == _XF:
            xf_ifmt.append(struct.unpack_from("<H", payload, 2)[0])
        if op == _BOUNDSHEET:
            (offset,) = struct.unpack_from("<I", payload, 0)
            # sheet name is a SHORT unicode string: 1-byte length
            cch, grbit = payload[6], payload[7]
            raw = payload[8 : 8 + cch * (2 if grbit & 0x01 else 1)]
            name = raw.decode(
                "utf-16-le" if grbit & 0x01 else "latin-1", "replace"
            )
            sheets.append((name, offset))
        elif op == _SST:
            sst_chunks = [payload]
        elif op == _CONTINUE and sst_chunks is not None:
            sst_chunks.append(payload)
        elif sst_chunks is not None and op not in (_SST, _CONTINUE):
            sst = _parse_sst(sst_chunks)
            sst_chunks = None
        if op == _EOF:
            break  # end of globals substream
    if sst_chunks is not None:
        sst = _parse_sst(sst_chunks)

    if not sheets:
        raise ValueError(f"{path}: workbook has no sheets")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f"{path}: sheet index {sheet} out of range")
        start = sheets[sheet][1]
    else:
        match = [s for s in sheets if s[0] == sheet]
        if not match:
            raise ValueError(f"{path}: no sheet named {sheet!r}")
        start = match[0][1]

    from .xlfmt import classify, render

    def fmt_num(d: float, ixfe: int) -> str:
        """Render a numeric cell per its XF number format (dates → ISO,
        times → clock, percents → scaled; else plain)."""
        ifmt = xf_ifmt[ixfe] if ixfe < len(xf_ifmt) else 0
        kind = classify(ifmt, formats.get(ifmt))
        if kind:
            return render(d, kind, ifmt, formats.get(ifmt))
        return _num_str(d)

    cells: dict[tuple[int, int], str] = {}
    pending_formula: tuple[int, int] | None = None
    depth = 0
    for _, op, payload in _records(stream, start):
        if op == _BOF:
            depth += 1
        elif op == _EOF:
            depth -= 1
            if depth <= 0:
                break
        elif op == _LABELSST:
            r, c, _, isst = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = sst[isst] if isst < len(sst) else ""
        elif op == _NUMBER:
            r, c, ixfe, d = struct.unpack_from("<HHHd", payload)
            cells[(r, c)] = fmt_num(d, ixfe)
        elif op == _RK:
            r, c, ixfe, rk = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = fmt_num(_rk_value(rk), ixfe)
        elif op == _MULRK:
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for i in range(n):
                ixfe, rk = struct.unpack_from("<HI", payload, 4 + 6 * i)
                cells[(r, c0 + i)] = fmt_num(_rk_value(rk), ixfe)
        elif op in (_LABEL, _RSTRING):
            r, c = struct.unpack_from("<HH", payload)
            cells[(r, c)] = _unicode_inline(payload, 6)
        elif op == _BOOLERR:
            r, c, _, v, is_err = struct.unpack_from("<HHHBB", payload)
            if is_err:
                cells[(r, c)] = _ERROR_TEXT.get(v, "#ERR")
            else:
                cells[(r, c)] = "TRUE" if v else "FALSE"
        elif op == _FORMULA:
            r, c = struct.unpack_from("<HH", payload)
            result = payload[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # cached string follows in a STRING record
                    pending_formula = (r, c)
                    cells[(r, c)] = ""
                elif kind == 1:
                    cells[(r, c)] = "TRUE" if result[2] else "FALSE"
                elif kind == 2:
                    cells[(r, c)] = _ERROR_TEXT.get(result[2], "#ERR")
                else:  # kind 3: empty string
                    cells[(r, c)] = ""
            else:
                (d,) = struct.unpack("<d", result)
                ixfe = struct.unpack_from("<H", payload, 4)[0]
                cells[(r, c)] = fmt_num(d, ixfe)
        elif op == _STRING and pending_formula is not None:
            cells[pending_formula] = _unicode_inline(payload, 0)
            pending_formula = None
        # BLANK/MULBLANK carry no value: missing cells already pad ""

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    width = {r: 0 for r in range(n_rows)}
    for r, c in cells:
        width[r] = max(width[r], c + 1)
    return [
        [cells.get((r, c), "") for c in range(width[r])]
        for r in range(n_rows)
    ]
