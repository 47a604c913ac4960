"""Minimal native OpenEXR scanline IO (numpy + zlib, no external codecs).

The reference reads its Blender-rendered depth maps (`depth_0000.exr`,
reference utils.py:44-53) through imageio's freeimage plugin, which needs a
network download; this image's OpenCV is built WITHOUT OpenEXR. Depth-EXR
ingestion is therefore implemented natively: single-part scanline files,
HALF/FLOAT/UINT channels, compressions NONE, RLE, ZIPS, ZIP — the set
Blender/Meshroom actually emit (PIZ/B44/DWA are lossy/wavelet codecs aimed at
film plates; rejected with an actionable message).

Format notes (OpenEXR file layout, openexr.com/en/latest/OpenEXRFileLayout):
  magic 0x01312f76, version int32 (2; bit 0x200 = tiled -> unsupported),
  attributes `name\\0 type\\0 size:int32 value` ending with a lone \\0,
  a uint64 chunk-offset table (ceil(H / linesPerBlock) entries),
  chunks of `y:int32 size:int32 payload`.
Uncompressed chunk payload: scanlines in order; per scanline each channel
(in chlist order, which the format requires to be alphabetical) contributes
width * pixelsize bytes. ZIP/ZIPS = zlib over a delta-predicted,
half-interleaved byte stream; RLE = the same predictor under a signed-count
byte RLE.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXEL_DTYPES = {0: np.dtype("<u4"), 1: np.dtype("<f2"), 2: np.dtype("<f4")}
_COMPRESSION_NAMES = {
    0: "none", 1: "rle", 2: "zips", 3: "zip", 4: "piz",
    5: "pxr24", 6: "b44", 7: "b44a", 8: "dwaa", 9: "dwab",
}
_LINES_PER_BLOCK = {0: 1, 1: 1, 2: 1, 3: 16}


def _predictor_decode(buf):
    """Inverse of the EXR delta predictor: t[i] += t[i-1] - 128 (mod 256)."""
    a = np.frombuffer(buf, np.uint8).astype(np.int64)
    a[1:] -= 128
    return np.cumsum(a).astype(np.uint8)


def _interleave(buf):
    """Inverse of the EXR split: halves -> even/odd byte positions."""
    n = len(buf)
    out = np.empty(n, np.uint8)
    h = (n + 1) // 2
    out[0::2] = buf[:h]
    out[1::2] = buf[h:]
    return out


def _predictor_encode(data):
    a = data.astype(np.int64)
    d = np.empty_like(a)
    d[0] = a[0]
    d[1:] = a[1:] - a[:-1] + 128
    return (d & 0xFF).astype(np.uint8)


def _deinterleave(data):
    n = len(data)
    h = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[:h] = data[0::2]
    out[h:] = data[1::2]
    return out


def _rle_decode(src, out_size):
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < out_size:
        count = struct.unpack_from("b", src, i)[0]
        i += 1
        if count < 0:
            out += src[i : i - count]
            i -= count
        else:
            out += src[i : i + 1] * (count + 1)
            i += 1
    return np.frombuffer(bytes(out[:out_size]), np.uint8)


def _rle_encode(data):
    """Valid (all-literal) EXR RLE stream: runs of up to 127 literals."""
    out = bytearray()
    b = data.tobytes()
    for i in range(0, len(b), 127):
        chunk = b[i : i + 127]
        out += struct.pack("b", -len(chunk)) + chunk
    return bytes(out)


def _decompress_block(payload, compression, out_size):
    if compression == 0:
        return np.frombuffer(payload, np.uint8)
    if len(payload) >= out_size:
        # EXR stores the block uncompressed when compression didn't shrink it
        return np.frombuffer(payload, np.uint8)
    if compression in (2, 3):
        raw = _predictor_decode(zlib.decompress(payload))
    elif compression == 1:
        raw = _predictor_decode(_rle_decode(payload, out_size))
    else:  # pragma: no cover - guarded by the header check
        raise NotImplementedError(compression)
    return _interleave(raw)


def read_exr_channels(path):
    """Read a scanline EXR. Returns ({channel_name: [H,W] float32}, header).

    UINT channels come back as float32 counts; HALF is upcast. Raises
    NotImplementedError with the codec name for unsupported compressions and
    ValueError for non-EXR/tiled/multi-part files.
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 8 or struct.unpack_from("<i", data, 0)[0] != _MAGIC:
        raise ValueError(f"{path}: not an EXR file (bad magic)")
    version = struct.unpack_from("<i", data, 4)[0]
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR not supported (scanline only)")
    if version & 0x1000:
        raise ValueError(f"{path}: multi-part EXR not supported")
    pos = 8

    def read_cstr(p):
        end = data.index(b"\0", p)
        return data[p:end].decode("latin-1"), end + 1

    header = {}
    channels = []  # (name, pixel_type int)
    while True:
        if data[pos] == 0:
            pos += 1
            break
        name, pos = read_cstr(pos)
        atype, pos = read_cstr(pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        val = data[pos : pos + size]
        pos += size
        header[name] = (atype, val)
        if name == "channels":
            cp = 0
            while val[cp] != 0:
                cname_end = val.index(b"\0", cp)
                cname = val[cp:cname_end].decode("latin-1")
                cp = cname_end + 1
                (ptype,) = struct.unpack_from("<i", val, cp)
                cp += 16  # type + pLinear/reserved + xSampling + ySampling
                channels.append((cname, ptype))

    if "dataWindow" not in header or "compression" not in header:
        raise ValueError(f"{path}: missing required EXR attributes")
    x0, y0, x1, y1 = struct.unpack("<4i", header["dataWindow"][1])
    W, H = x1 - x0 + 1, y1 - y0 + 1
    compression = header["compression"][1][0]
    if compression not in _LINES_PER_BLOCK:
        raise NotImplementedError(
            f"{path}: EXR compression '{_COMPRESSION_NAMES.get(compression, compression)}'"
            " not supported (none, rle, zips, zip are)"
        )
    lpb = _LINES_PER_BLOCK[compression]
    n_chunks = -(-H // lpb)
    offsets = struct.unpack_from(f"<{n_chunks}Q", data, pos)

    row_bytes = [
        (_PIXEL_DTYPES[pt], W * _PIXEL_DTYPES[pt].itemsize) for _, pt in channels
    ]
    line_bytes = sum(rb for _, rb in row_bytes)
    out = {name: np.empty((H, W), np.float32) for name, _ in channels}

    for off in offsets:
        y, size = struct.unpack_from("<2i", data, off)
        payload = data[off + 8 : off + 8 + size]
        y_rel = y - y0
        n_lines = min(lpb, H - y_rel)
        raw = _decompress_block(payload, compression, n_lines * line_bytes)
        p = 0
        for li in range(n_lines):
            for (cname, _), (dt, rb) in zip(channels, row_bytes):
                row = np.frombuffer(raw[p : p + rb].tobytes(), dt)
                out[cname][y_rel + li] = row.astype(np.float32)
                p += rb
    return out, header


def read_exr_image(path):
    """EXR -> numpy image: [H,W,3|4] float32 for R/G/B(/A) files, [H,W] for
    single-channel files, else channels stacked in sorted-name order."""
    chans, _ = read_exr_channels(path)
    names = set(chans)
    if {"R", "G", "B"} <= names:
        order = ["R", "G", "B"] + (["A"] if "A" in names else [])
        return np.stack([chans[c] for c in order], axis=-1)
    if len(chans) == 1:
        return next(iter(chans.values()))
    return np.stack([chans[k] for k in sorted(chans)], axis=-1)


def write_exr(path, channels, compression="zip"):
    """Write a scanline EXR. channels: {name: [H,W] array} (float32 ->
    FLOAT, float16 -> HALF, uint32 -> UINT); or a [H,W(,C)] array, stored as
    Y / R,G,B(,A). compression: none | rle | zips | zip."""
    if isinstance(channels, np.ndarray):
        a = channels
        if a.ndim == 2:
            channels = {"Y": a}
        else:
            names = ["R", "G", "B", "A"][: a.shape[2]]
            channels = {n: a[..., i] for i, n in enumerate(names)}
    comp_id = {"none": 0, "rle": 1, "zips": 2, "zip": 3}[compression]
    lpb = _LINES_PER_BLOCK[comp_id]

    names = sorted(channels)  # chlist must be alphabetical
    arrs = {}
    ptypes = {}
    H = W = None
    for n in names:
        a = np.asarray(channels[n])
        assert a.ndim == 2, (n, a.shape)
        if H is None:
            H, W = a.shape
        assert a.shape == (H, W), (n, a.shape)
        if a.dtype == np.float16:
            ptypes[n] = 1
        elif a.dtype == np.uint32:
            ptypes[n] = 0
        else:
            a = a.astype(np.float32)
            ptypes[n] = 2
        arrs[n] = np.ascontiguousarray(a)

    def attr(name, atype, val):
        return name.encode() + b"\0" + atype.encode() + b"\0" + struct.pack("<i", len(val)) + val

    chlist = b""
    for n in names:
        chlist += n.encode() + b"\0" + struct.pack("<iBBBBii", ptypes[n], 0, 0, 0, 0, 1, 1)
    chlist += b"\0"

    header = b"".join([
        attr("channels", "chlist", chlist),
        attr("compression", "compression", bytes([comp_id])),
        attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, W - 1, H - 1)),
        attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, W - 1, H - 1)),
        attr("lineOrder", "lineOrder", b"\0"),
        attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0)),
        attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
    ]) + b"\0"

    n_chunks = -(-H // lpb)
    chunks = []
    for ci in range(n_chunks):
        y0c = ci * lpb
        n_lines = min(lpb, H - y0c)
        parts = []
        for li in range(n_lines):
            for n in names:
                parts.append(arrs[n][y0c + li].tobytes())
        raw = np.frombuffer(b"".join(parts), np.uint8)
        if comp_id == 0:
            payload = raw.tobytes()
        else:
            enc = _predictor_encode(_deinterleave(raw))
            payload = (
                zlib.compress(enc.tobytes()) if comp_id in (2, 3)
                else _rle_encode(enc)
            )
            if len(payload) >= len(raw):  # store raw, like OpenEXR does
                payload = raw.tobytes()
        chunks.append((y0c, payload))

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, 2))
        f.write(header)
        base = 8 + len(header) + 8 * n_chunks
        off = base
        for y0c, payload in chunks:
            f.write(struct.pack("<Q", off))
            off += 8 + len(payload)
        for y0c, payload in chunks:
            f.write(struct.pack("<2i", y0c, len(payload)))
            f.write(payload)
