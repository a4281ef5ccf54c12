"""Image output: OpenEXR (self-contained writer/reader) and PNG.

The reference writes linear EXR plus tonemapped PNG per sensor
(reference src/main.cpp:404-482, include/wt/bitmap/write2d.hpp:28). No EXR
binding is guaranteed in this environment, so a minimal native EXR 2.0
codec is implemented here: single-part scanline images, ZIP or no
compression, float/half channels — enough for interchange with any EXR
reader, including metadata attributes (renderer/scene/spp stamping).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PIXELTYPE_HALF = 1
_PIXELTYPE_FLOAT = 2

MAGIC = 20000630


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return name.encode() + b"\0" + typ.encode() + b"\0" \
        + struct.pack("<i", len(data)) + data


def _reorder_zip(data: bytes) -> bytes:
    """EXR zip predictor: delta-encode, then interleave halves."""
    arr = np.frombuffer(data, np.uint8).astype(np.int16)
    d = np.empty_like(arr)
    d[0] = arr[0]
    d[1:] = (arr[1:] - arr[:-1] + 128 + 256) & 0xFF
    # split into two halves, interleaved
    n = len(d)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[:half] = d[0::2]
    out[half:] = d[1::2]
    return out.tobytes()


def _unreorder_unzip(data: bytes) -> bytes:
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    inter = np.empty(n, np.uint8)
    inter[0::2] = arr[:half]
    inter[1::2] = arr[half:]
    out = np.cumsum(inter.astype(np.int64) - 128, dtype=np.int64) \
        + 128 * np.arange(1, n + 1) - 128 * np.arange(n) * 0
    # delta decode: b[i] = b[i-1] + (inter[i] - 128)
    dec = np.empty(n, np.uint8)
    acc = 0
    # vectorized cumulative sum implementation
    deltas = inter.astype(np.int64)
    deltas[1:] -= 128
    dec = (np.cumsum(deltas) & 0xFF).astype(np.uint8)
    return dec.tobytes()


def write_exr(path: str, img: np.ndarray, channel_names=None,
              half: bool = True, compress: bool = True,
              metadata: dict | None = None):
    """Write (H, W) or (H, W, C) float image as scanline EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    if channel_names is None:
        channel_names = {1: ["Y"], 3: ["R", "G", "B"],
                         4: ["R", "G", "B", "A"]}.get(
            C, [f"ch{i}" for i in range(C)])
    # channels must be stored alphabetically
    order = np.argsort(channel_names)
    ptype = _PIXELTYPE_HALF if half else _PIXELTYPE_FLOAT
    pixsize = 2 if half else 4

    chlist = b""
    for ci in order:
        chlist += channel_names[ci].encode() + b"\0" \
            + struct.pack("<iiii", ptype, 0, 1, 1)
    chlist += b"\0"

    compression = 3 if compress else 0   # 3 = ZIP (16 scanlines)
    block = 16 if compress else 1

    hdr = struct.pack("<i", MAGIC) + struct.pack("<i", 2)
    hdr += _attr("channels", "chlist", chlist)
    hdr += _attr("compression", "compression", bytes([compression]))
    hdr += _attr("dataWindow", "box2i",
                 struct.pack("<4i", 0, 0, W - 1, H - 1))
    hdr += _attr("displayWindow", "box2i",
                 struct.pack("<4i", 0, 0, W - 1, H - 1))
    hdr += _attr("lineOrder", "lineOrder", b"\0")
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    for k, v in (metadata or {}).items():
        sv = str(v).encode() + b"\0"
        hdr += _attr(str(k), "string", struct.pack("<i", len(sv) - 1)
                     if False else sv)
    hdr += b"\0"

    dtype = np.float16 if half else np.float32
    if half:
        # clamp to the finite half range: a few hot fireflies otherwise
        # overflow to inf in the cast
        img = np.clip(img, -65504.0, 65504.0)
    blocks = []
    for y0 in range(0, H, block):
        y1 = min(y0 + block, H)
        rows = []
        for y in range(y0, y1):
            for ci in order:
                rows.append(img[y, :, ci].astype(dtype).tobytes())
        raw = b"".join(rows)
        if compress:
            comp = zlib.compress(_reorder_zip(raw), 6)
            if len(comp) >= len(raw):
                comp = raw
        else:
            comp = raw
        blocks.append((y0, comp))

    num_blocks = len(blocks)
    offset_table_size = 8 * num_blocks
    data_start = len(hdr) + offset_table_size
    offsets = []
    pos = data_start
    payloads = []
    for y0, comp in blocks:
        offsets.append(pos)
        payload = struct.pack("<i", y0) + struct.pack("<i", len(comp)) + comp
        payloads.append(payload)
        pos += len(payload)

    with open(path, "wb") as f:
        f.write(hdr)
        for o in offsets:
            f.write(struct.pack("<Q", o))
        for p in payloads:
            f.write(p)


def read_exr(path: str):
    """Minimal reader for files written by write_exr (+ uncompressed/ZIP
    scanline EXRs with half/float channels). Returns (img, channel_names)."""
    with open(path, "rb") as f:
        buf = f.read()
    off = 0

    def take(n):
        nonlocal off
        out = buf[off:off + n]
        off += n
        return out

    magic, version = struct.unpack("<ii", take(8))
    assert magic == MAGIC, "not an EXR file"

    chans = []
    compression = 0
    dw = (0, 0, 0, 0)
    while True:
        # attribute name
        e = buf.index(b"\0", off)
        name = buf[off:e].decode()
        off = e + 1
        if name == "":
            break
        e = buf.index(b"\0", off)
        typ = buf[off:e].decode()
        off = e + 1
        (size,) = struct.unpack("<i", take(4))
        data = take(size)
        if name == "channels":
            p = 0
            while data[p] != 0:
                e2 = data.index(b"\0", p)
                cname = data[p:e2].decode()
                p = e2 + 1
                ptype, _, _, _ = struct.unpack("<iiii", data[p:p + 16])
                p += 16
                chans.append((cname, ptype))
        elif name == "compression":
            compression = data[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", data)

    W = dw[2] - dw[0] + 1
    H = dw[3] - dw[1] + 1
    C = len(chans)
    block = {0: 1, 2: 1, 3: 16}.get(compression)
    if block is None:
        raise ValueError(f"unsupported compression {compression}")
    num_blocks = (H + block - 1) // block
    take(8 * num_blocks)  # offset table

    img = np.zeros((H, W, C), np.float32)
    for _ in range(num_blocks):
        (y0,) = struct.unpack("<i", take(4))
        (sz,) = struct.unpack("<i", take(4))
        comp = take(sz)
        y1 = min(y0 + block, H)
        rowbytes = sum(2 if pt == _PIXELTYPE_HALF else 4
                       for _, pt in chans) * W
        want = rowbytes * (y1 - y0)
        raw = comp if len(comp) == want else _unreorder_unzip(
            zlib.decompress(comp))
        p = 0
        for y in range(y0, y1):
            for ci, (cname, ptype) in enumerate(chans):
                n = W * (2 if ptype == _PIXELTYPE_HALF else 4)
                dt = np.float16 if ptype == _PIXELTYPE_HALF else np.float32
                img[y, :, ci] = np.frombuffer(raw[p:p + n], dt)
                p += n
    names = [c for c, _ in chans]
    return img, names


def write_png(path: str, img01: np.ndarray):
    """8-bit PNG from a [0,1] float image via PIL."""
    from PIL import Image
    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def encode_png(img01: np.ndarray) -> bytes:
    """8-bit PNG bytes from a [0,1] float image (live-UI previews)."""
    import io
    from PIL import Image
    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()
