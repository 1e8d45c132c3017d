#!/usr/bin/env python3
"""Dev tooling (not engine code): writes the checked-in image fixtures
under src/test/resources/fixtures/ used by ImageCodecSpec /
MultimodalSpec. Deterministic 8x6 gradient where pixel (x, y) has
R = x*30, G = y*40, B = (x+y)*10 — values the specs re-derive and
assert pixel-by-pixel. Formats are hand-assembled from their public
specs (Netpbm P6; Windows 24-bit uncompressed BMP), no image library.
Run once; the binary outputs are committed.
"""
import os
import struct

W, H = 8, 6
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")


def px(x, y):
    return (x * 30, y * 40, (x + y) * 10)


def write_ppm(path):
    # include a comment line to exercise the header comment-skip path
    header = b"P6\n# graft fixture 8x6 gradient\n%d %d\n255\n" % (W, H)
    body = bytearray()
    for y in range(H):
        for x in range(W):
            r, g, b = px(x, y)
            body += bytes((r, g, b))
    with open(path, "wb") as f:
        f.write(header + bytes(body))


def write_bmp(path):
    row_stride = (W * 3 + 3) // 4 * 4
    data = bytearray(row_stride * H)
    for y in range(H):
        dst_row = H - 1 - y  # bottom-up storage
        for x in range(W):
            r, g, b = px(x, y)
            o = dst_row * row_stride + x * 3
            data[o:o + 3] = bytes((b, g, r))  # BGR
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(file_header + dib + bytes(data))


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    write_ppm(os.path.join(OUT, "gradient.ppm"))
    write_bmp(os.path.join(OUT, "gradient.bmp"))
    print("wrote fixtures to", os.path.abspath(OUT))
