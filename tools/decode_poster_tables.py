"""Decode the reference poster's result tables (BASELINE.md provenance).

The VETO poster (`/root/reference/poster/VETO_poster.pdf`) renders Tables
1-2 as vector text in embedded Arial CID fonts whose PDF ToUnicode CMaps
are corrupt (PowerPoint export bug), which is why generic text extraction
yields garbage.  The glyph ids are recoverable from each font's OWN
embedded TrueType program: parse `FontFile2` → `cmap` (format 4) →
unicode→glyph map, invert it, and replay the table XObjects' content
streams (Tf/Td/TD/Tm/Tj/TJ) grouping runs by text-line y.

Usage: python tools/decode_poster_tables.py [poster.pdf]
Prints the reconstructed tables; BASELINE.md "Pinned parity targets"
records the decoded values (cross-checked against the published SHA+GCL
paper numbers, which the poster reproduces exactly).
"""

from __future__ import annotations

import json
import re
import struct
import sys
import zlib
from collections import defaultdict

STR = rb"\(((?:[^()\\]|\\.)*)\)"


def load_objects(data: bytes) -> dict:
    objs = {}
    for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", data, re.S):
        objs[int(m.group(1))] = m.group(3)
    return objs


def parse_stream(body: bytes):
    sm = re.search(rb"stream\r?\n(.*?)endstream", body, re.S)
    if not sm:
        return None
    raw = sm.group(1)
    for r in (raw, raw.rstrip(b"\r\n")):
        try:
            return zlib.decompress(r)
        except Exception:
            pass
    return raw


def fontfile2(objs, font_obj: int) -> bytes:
    """Type0 font object → embedded TrueType bytes."""
    df = re.search(rb"/DescendantFonts\s+(\d+)\s+\d+\s+R", objs[font_obj])
    child = re.search(rb"(\d+)\s+\d+\s+R", objs[int(df.group(1))])
    dfo = objs[int(child.group(1))]
    fd = re.search(rb"/FontDescriptor\s+(\d+)\s+\d+\s+R", dfo)
    ff = re.search(rb"/FontFile2\s+(\d+)\s+\d+\s+R", objs[int(fd.group(1))])
    return parse_stream(objs[int(ff.group(1))])


def ttf_gid_to_unicode(ttf: bytes) -> dict:
    """Parse the TrueType `cmap` format-4 subtable; return gid → char."""
    num_tables = struct.unpack(">H", ttf[4:6])[0]
    tables = {}
    for i in range(num_tables):
        off = 12 + 16 * i
        offset, length = struct.unpack(">II", ttf[off + 8 : off + 16])
        tables[ttf[off : off + 4]] = (offset, length)
    co, _ = tables[b"cmap"]
    n = struct.unpack(">H", ttf[co + 2 : co + 4])[0]
    best = None
    for i in range(n):
        pid, eid, off = struct.unpack(">HHI", ttf[co + 4 + 8 * i : co + 12 + 8 * i])
        if struct.unpack(">H", ttf[co + off : co + off + 2])[0] == 4:
            best = co + off
    seg2 = struct.unpack(">H", ttf[best + 6 : best + 8])[0]
    segs = seg2 // 2
    ends = struct.unpack(">%dH" % segs, ttf[best + 14 : best + 14 + seg2])
    starts = struct.unpack(">%dH" % segs, ttf[best + 16 + seg2 : best + 16 + 2 * seg2])
    deltas = struct.unpack(">%dh" % segs, ttf[best + 16 + 2 * seg2 : best + 16 + 3 * seg2])
    ro_base = best + 16 + 3 * seg2
    rngoffs = struct.unpack(">%dH" % segs, ttf[ro_base : ro_base + seg2])
    g2u = {}
    for i in range(segs):
        for c in range(starts[i], min(ends[i], 0xFFFF) + 1):
            if rngoffs[i] == 0:
                g = (c + deltas[i]) & 0xFFFF
            else:
                addr = ro_base + 2 * i + rngoffs[i] + 2 * (c - starts[i])
                if addr + 2 > len(ttf):
                    continue
                g = struct.unpack(">H", ttf[addr : addr + 2])[0]
                if g:
                    g = (g + deltas[i]) & 0xFFFF
            if g:
                g2u.setdefault(g, chr(c))
    return g2u


def _unescape(b: bytes) -> bytes:
    def rep(m):
        g = m.group(1)
        d = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
             b"(": b"(", b")": b")", b"\\": b"\\"}
        if g in d:
            return d[g]
        if g[:1].isdigit():
            return bytes([int(g, 8) & 0xFF])
        return g

    return re.sub(rb"\\([nrtbf()\\]|[0-7]{1,3})", rep, b)


TOK = re.compile(
    rb"/([A-Za-z0-9]+)\s+([\d.]+)\s+Tf"
    rb"|" + STR + rb"\s*Tj"
    rb"|<([0-9A-Fa-f]+)>\s*Tj"
    rb"|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ"
    rb"|([-\d.]+)\s+([-\d.]+)\s+Td"
    rb"|([-\d.]+)\s+([-\d.]+)\s+TD"
    rb"|([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+Tm",
    re.S,
)


def decode_xobject(objs, xnum: int, fonts: dict) -> str:
    """Replay one Form XObject's text with per-font gid maps."""
    content = parse_stream(objs[xnum])
    cur = {}
    runs = []
    x = y = 0.0

    def dec(s):
        return "".join(cur.get((s[i] << 8) | s[i + 1], "?")
                       for i in range(0, len(s) - 1, 2))

    for tok in TOK.finditer(content):
        g = tok.groups()
        if g[0] is not None:
            cur = fonts.get(g[0].decode(), {})
        elif g[2] is not None or g[3] is not None:
            s = _unescape(g[2]) if g[2] is not None else bytes.fromhex(g[3].decode())
            runs.append((round(-y, 1), round(x, 1), dec(s)))
        elif g[4] is not None:
            parts = []
            for sm in re.finditer(STR + rb"|<([0-9A-Fa-f]+)>", g[4], re.S):
                s = (_unescape(sm.group(1)) if sm.group(1) is not None
                     else bytes.fromhex(sm.group(2).decode()))
                parts.append(dec(s))
            runs.append((round(-y, 1), round(x, 1), "".join(parts)))
        elif g[5] is not None:
            x += float(g[5]); y += float(g[6])
        elif g[7] is not None:
            x += float(g[7]); y += float(g[8])
        elif g[9] is not None:
            x, y = float(g[13]), float(g[14])

    lines = defaultdict(list)
    for yy, xx, t in runs:
        lines[yy].append((xx, t))
    out = []
    for yy in sorted(lines):
        out.append("".join(t for _, t in sorted(lines[yy])))
    return "\n".join(out)


def main(path="/root/reference/poster/VETO_poster.pdf"):
    data = open(path, "rb").read()
    objs = load_objects(data)
    # font objects 816 (Arial-BoldMT) and 9 (ArialMT) carry the tables
    maps = {n: ttf_gid_to_unicode(fontfile2(objs, n)) for n in (816, 9)}
    for title, xnum in (("Table 1 (VG)", 821), ("Table 2 (GQA)", 822)):
        fonts = {"F8": maps[816], "F1": maps[9]}
        print(f"===== {title} — xobject {xnum} =====")
        print(decode_xobject(objs, xnum, fonts))
        print()


if __name__ == "__main__":
    main(*sys.argv[1:])
