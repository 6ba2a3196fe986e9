"""Minimal OLE2 + BIFF8 (.xls) reader.

The healthcare-district membership table ships as a legacy Excel
workbook (reference: calc/datasets.py:41-45 reads
data/shp_jasenkunnat_2020.xls via pandas+xlrd). No Excel reader is
available in this environment, so we parse the subset of the format we
need: the compound-file container, the shared string table, and
LABELSST/NUMBER/RK/MULRK cell records.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Tuple


def _read_ole2_stream(raw: bytes, stream_name: str) -> bytes:
    if raw[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise ValueError("not an OLE2 compound file")
    sector_size = 1 << struct.unpack("<H", raw[30:32])[0]
    mini_size = 1 << struct.unpack("<H", raw[32:34])[0]
    num_fat = struct.unpack("<I", raw[44:48])[0]
    dir_start = struct.unpack("<I", raw[48:52])[0]
    mini_cutoff = struct.unpack("<I", raw[56:60])[0]
    minifat_start = struct.unpack("<I", raw[60:64])[0]
    num_minifat = struct.unpack("<I", raw[64:68])[0]
    difat_start = struct.unpack("<I", raw[68:72])[0]
    num_difat = struct.unpack("<I", raw[72:76])[0]

    def sector(n: int) -> bytes:
        off = 512 + n * sector_size
        return raw[off:off + sector_size]

    difat = list(struct.unpack("<109I", raw[76:512]))
    s = difat_start
    for _ in range(num_difat):
        ents = struct.unpack("<%dI" % (sector_size // 4), sector(s))
        difat += ents[:-1]
        s = ents[-1]
    fat: List[int] = []
    for fs in difat[:num_fat]:
        if fs in (0xFFFFFFFF, 0xFFFFFFFE):
            continue
        fat += struct.unpack("<%dI" % (sector_size // 4), sector(fs))

    END = (0xFFFFFFFE, 0xFFFFFFFF)

    def read_chain(start, fat_table, reader):
        out, s, seen = [], start, set()
        while s not in END and s not in seen:
            seen.add(s)
            out.append(reader(s))
            s = fat_table[s]
        return b"".join(out)

    dirdata = read_chain(dir_start, fat, sector)
    entries = []
    for i in range(0, len(dirdata), 128):
        e = dirdata[i:i + 128]
        if len(e) < 128:
            break
        namelen = struct.unpack("<H", e[64:66])[0]
        name = e[:max(0, namelen - 2)].decode("utf-16-le", "ignore")
        etype = e[66]
        start = struct.unpack("<I", e[116:120])[0]
        size = struct.unpack("<I", e[120:124])[0]
        entries.append((name, etype, start, size))

    root = next(e for e in entries if e[1] == 5)
    ministream = read_chain(root[2], fat, sector)
    minifat: List[int] = []
    if num_minifat:
        mfdata = read_chain(minifat_start, fat, sector)
        minifat = list(struct.unpack("<%dI" % (len(mfdata) // 4), mfdata))

    e = next(x for x in entries if x[0] == stream_name)
    if e[3] >= mini_cutoff:
        return read_chain(e[2], fat, sector)[:e[3]]
    return read_chain(
        e[2], minifat,
        lambda n: ministream[n * mini_size:(n + 1) * mini_size])[:e[3]]


def _parse_sst(payload: bytes, continues: List[bytes]) -> List[str]:
    bufs = [payload] + continues
    _total, unique = struct.unpack("<II", bufs[0][:8])
    strings: List[str] = []
    bi, off = 0, 8
    for _ in range(unique):
        if off + 3 > len(bufs[bi]):
            bi += 1
            off = 0
        clen, flags = struct.unpack("<HB", bufs[bi][off:off + 3])
        off += 3
        nrich = next_ = 0
        if flags & 8:
            nrich = struct.unpack("<H", bufs[bi][off:off + 2])[0]
            off += 2
        if flags & 4:
            next_ = struct.unpack("<I", bufs[bi][off:off + 4])[0]
            off += 4
        wide = flags & 1
        chars: List[str] = []
        remaining = clen
        while remaining:
            if off >= len(bufs[bi]):
                # string continues in next record; a fresh grbit leads it
                bi += 1
                off = 0
                wide = bufs[bi][off] & 1
                off += 1
            avail = len(bufs[bi]) - off
            nbytes = remaining * (2 if wide else 1)
            take = min(nbytes, avail - (avail % 2 if wide else 0))
            if take <= 0:
                bi += 1
                off = 0
                wide = bufs[bi][off] & 1
                off += 1
                continue
            seg = bufs[bi][off:off + take]
            chars.append(seg.decode("utf-16-le" if wide else "latin-1"))
            off += take
            remaining -= take // (2 if wide else 1)
        skip = nrich * 4 + next_
        while skip:
            if off >= len(bufs[bi]):
                bi += 1
                off = 0
            t = min(skip, len(bufs[bi]) - off)
            off += t
            skip -= t
        strings.append("".join(chars))
    return strings


def _rk_value(rk: int) -> float:
    if rk & 2:
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:
        val = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100 if rk & 1 else val


def read_xls(path: str) -> Dict[str, Dict[Tuple[int, int], object]]:
    """Return {sheet_name: {(row, col): value}} for all cells we understand."""
    raw = open(path, "rb").read()
    wb = _read_ole2_stream(raw, "Workbook")

    records = []
    pos = 0
    while pos + 4 <= len(wb):
        rid, rlen = struct.unpack("<HH", wb[pos:pos + 4])
        records.append((rid, pos, wb[pos + 4:pos + 4 + rlen]))
        pos += 4 + rlen

    sst: List[str] = []
    sheets: List[Tuple[str, int]] = []
    for i, (rid, _rpos, payload) in enumerate(records):
        if rid == 0x00FC:  # SST
            conts = []
            j = i + 1
            while j < len(records) and records[j][0] == 0x003C:  # CONTINUE
                conts.append(records[j][2])
                j += 1
            sst = _parse_sst(payload, conts)
        elif rid == 0x0085:  # BOUNDSHEET
            nl = payload[6]
            opts = payload[7]
            name = payload[8:8 + nl * (2 if opts & 1 else 1)].decode(
                "utf-16-le" if opts & 1 else "latin-1")
            sheets.append((name, struct.unpack("<I", payload[:4])[0]))

    bounds = sorted(off for _, off in sheets) + [len(wb)]
    out: Dict[str, Dict[Tuple[int, int], object]] = {}
    for sname, soff in sheets:
        end = min(b for b in bounds if b > soff)
        cells: Dict[Tuple[int, int], object] = {}
        for rid, rpos, payload in records:
            if not (soff <= rpos < end):
                continue
            if rid == 0x00FD:  # LABELSST
                row, col, _xf, isst = struct.unpack("<HHHI", payload[:10])
                cells[(row, col)] = sst[isst]
            elif rid == 0x0203:  # NUMBER
                row, col = struct.unpack("<HH", payload[:4])
                cells[(row, col)] = struct.unpack("<d", payload[6:14])[0]
            elif rid == 0x027E:  # RK
                row, col = struct.unpack("<HH", payload[:4])
                cells[(row, col)] = _rk_value(struct.unpack("<I", payload[6:10])[0])
            elif rid == 0x00BD:  # MULRK
                row, colfirst = struct.unpack("<HH", payload[:4])
                collast = struct.unpack("<H", payload[-2:])[0]
                for k in range(collast - colfirst + 1):
                    rk = struct.unpack("<I", payload[4 + 6 * k + 2:4 + 6 * k + 6])[0]
                    cells[(row, colfirst + k)] = _rk_value(rk)
        out[sname] = cells
    return out
