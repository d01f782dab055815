#!/usr/bin/env python3
"""Writes src/test/resources/graft/clip.avi: a 4-frame 8x6 24-bit
raw-DIB (BI_RGB) AVI, built with NOTHING but struct packing — an
implementation of the RIFF/AVI container fully independent of the
JVM-side parser it fixtures (same playbook as the python-`wave`-written
WAV fixtures). Pixel formula is re-derived in VideoCodecSpec:

  frame f, pixel (x, y):  R=(x*30+f*40)%256  G=(y*50)%256  B=(f*60)%256
"""
import struct, os

W, H, N = 8, 6, 4
STRIDE = (W * 3 + 3) // 4 * 4


def pixel(f, x, y):
    return bytes((((f * 60) % 256), ((y * 50) % 256), ((x * 30 + f * 40) % 256)))  # B,G,R


def frame_bytes(f):
    rows = []
    for y in reversed(range(H)):  # bottom-up row order
        row = b"".join(pixel(f, x, y) for x in range(W))
        rows.append(row + b"\x00" * (STRIDE - len(row)))
    return b"".join(rows)


def chunk(fourcc, data):
    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")


def lst(typ, data):
    return chunk(b"LIST", typ + data)


avih = struct.pack("<10I16x", 40000, 0, 0, 0, N, 0, 1, 0, W, H)
strh = struct.pack("<4s4sIHHIIIIIIII4H",
                   b"vids", b"DIB ", 0, 0, 0, 0, 1, 25, 0, N, 0, 0, 0, 0, 0, W, H)
strf = struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, STRIDE * H, 0, 0, 0, 0)
hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
movi = lst(b"movi", b"".join(chunk(b"00db", frame_bytes(f)) for f in range(N)))
body = b"AVI " + hdrl + movi
riff = b"RIFF" + struct.pack("<I", len(body)) + body

out = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "clip.avi")
with open(out, "wb") as fh:
    fh.write(riff)
print(f"wrote {out}: {len(riff)} bytes, {N} frames {W}x{H}")
