"""JPEG codec — pure stdlib + numpy (ITU T.81 spec), no external libraries.

The container has no Pillow, but JPEG's Huffman modes need no external
codec: entropy coding is canonical Huffman over (run, size) symbols, the
transform is the 8×8 DCT, and every table the decoder needs (quantization,
Huffman) is DECLARED IN THE FILE (DQT/DHT segments) — so the decoder
handles real web/camera JPEGs regardless of which tables their encoder
chose. Supported: BASELINE (SOF0/1 — 4:2:0, restart markers, grayscale)
and PROGRESSIVE (SOF2 — spectral selection, successive approximation, DC
and AC first/refinement scans, EOB runs, the non-interleaved used-block
geometry of A.2.2). Lossless / hierarchical / arithmetic-coded SOFs raise
ValueError.

The encoders exist as the fixture/round-trip side: spec-conformant
baseline AND progressive streams (JFIF color transform, per-scan canonical
Huffman tables built from actual symbol frequencies), so tests pin the
decoder with independently-computed pixels — the progressive encoding of
an image must decode PIXEL-IDENTICAL to its baseline encoding (same
quantized coefficients, two entropy representations).

Everything here is a pure function of its inputs (core/ rule: no Spark).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan, generated (diagonal walk), not memorized."""
    order = np.empty((8, 8), dtype=np.int64)
    idx = 0
    for s in range(15):
        rng = range(min(s, 7), max(s - 7, 0) - 1, -1) if s % 2 == 0 else range(
            max(s - 7, 0), min(s, 7) + 1
        )
        for i in rng:
            j = s - i
            order[i, j] = idx
            idx += 1
    return order


_ZZ = _zigzag_order()                 # (row, col) -> zigzag position
_ZZ_FLAT = _ZZ.reshape(-1)            # natural order -> zigzag position
_INV_ZZ = np.argsort(_ZZ_FLAT)        # zigzag position -> natural order


def _dct_matrix() -> np.ndarray:
    a = np.empty((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()  # forward: F = A @ f @ A.T ; inverse: f = A.T @ F @ A

# a mild, public-shape quantization default (flat-ish low-loss); any table
# is legal — it is written into DQT and read back by the decoder
_QUANT_LUMA = np.clip(np.add.outer(np.arange(8), np.arange(8)) * 2 + 4, 1, 255).astype(
    np.uint8
)
_QUANT_CHROMA = np.clip(np.add.outer(np.arange(8), np.arange(8)) * 3 + 6, 1, 255).astype(
    np.uint8
)


# ------------------------------------------------------------ bit plumbing


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s

    def marker(self, second_byte: int) -> None:
        """Emit a real marker (RSTn) — byte-aligned, never stuffed."""
        self.byte_align()
        self.out.append(0xFF)
        self.out.append(second_byte)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (leaves position on the 0xFF)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # real marker: spec says entropy data is over; feed 0 bits
                # (only well-formed streams are expected to ask)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, length: int) -> int:
        while self.nbits < length:
            self._fill()
        self.nbits -= length
        v = (self.acc >> self.nbits) & ((1 << length) - 1)
        return v

    def align_to_marker(self) -> None:
        """Drop partial byte and consume an RST marker if present."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        if 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


# ------------------------------------------------------- huffman machinery


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _build_table(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Fixed-length canonical table over the used symbols: n symbols at
    length L = ceil(log2(n)) + 1 (strict Kraft slack keeps the all-ones
    code unused, as baseline practice expects). Simple, always legal, and
    declared in DHT so the decoder needs no convention."""
    syms = sorted(freqs)
    if not syms:
        syms = [0]
    n = len(syms)
    length = max(int(np.ceil(np.log2(n))) + 1, 2)
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def _read_huff_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, bits) per the spec's signed-magnitude coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ------------------------------------------------------------------ encode


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _block_ops(zz: np.ndarray, pred: int) -> tuple[list[tuple], int]:
    """One quantized zigzag block -> [(kind, sym/size, ...)] ops + new DC
    predictor."""
    ops: list[tuple] = []
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    ops.append(("dc", size, bits))
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ops.append(("ac", 0xF0, 0, 0))
            run -= 16
        size, bits = _magnitude(v)
        ops.append(("ac", (run << 4) | size, size, bits))
        run = 0
    if run:
        ops.append(("ac", 0x00, 0, 0))
    return ops, int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    subsampling: str = "4:4:4",
    quant_luma: np.ndarray = _QUANT_LUMA,
    quant_chroma: np.ndarray = _QUANT_CHROMA,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB -> baseline JFIF JPEG bytes. ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every N MCUs (DC predictors
    reset, stream byte-aligned) — the real-world error-resilience layout."""
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    if subsampling == "4:2:0":
        hs = vs = 2
    elif subsampling == "4:4:4":
        hs = vs = 1
    else:
        raise ValueError(f"unsupported subsampling {subsampling}")

    y = _pad_to(ycc[:, :, 0], 8 * vs, 8 * hs)
    cb_full = _pad_to(ycc[:, :, 1], 8 * vs, 8 * hs)
    cr_full = _pad_to(ycc[:, :, 2], 8 * vs, 8 * hs)
    if hs == 2:
        cb = cb_full.reshape(cb_full.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        cr = cr_full.reshape(cr_full.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
    else:
        cb, cr = cb_full, cr_full

    q = [quant_luma.astype(np.float64), quant_chroma.astype(np.float64)]
    comp_planes = [(y, 0), (cb, 1), (cr, 1)]
    comp_qzz = []  # per component: 2D grid [by][bx] of zigzag vectors
    for plane, qid in comp_planes:
        blocks = _blocks(plane)
        grid = [
            [
                np.round(
                    (_A @ (blocks[by, bx] - 128.0) @ _A.T) / q[qid]
                ).astype(np.int64).reshape(-1)[_INV_ZZ]
                for bx in range(blocks.shape[1])
            ]
            for by in range(blocks.shape[0])
        ]
        comp_qzz.append(grid)

    # blocks in the EXACT MCU emission order (DC prediction follows this
    # order per component — matters when vs/hs > 1)
    yb = _blocks(y).shape
    mcus_y, mcus_x = yb[0] // vs, yb[1] // hs
    ordered: list[list[np.ndarray]] = [[], [], []]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for b in range(hs * vs):
                by = my * vs + b // hs
                bx = mx * hs + b % hs
                ordered[0].append(comp_qzz[0][by][bx])
            ordered[1].append(comp_qzz[1][my][mx])
            ordered[2].append(comp_qzz[2][my][mx])

    # pass 1: symbol streams in MCU order with restart-aware DC prediction
    streams: list[list[list[tuple]]] = [[], [], []]
    pred = [0, 0, 0]
    ptr = [0, 0, 0]
    mcu_i = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                pred = [0, 0, 0]
            mcu_i += 1
            for ci, nb in ((0, hs * vs), (1, 1), (2, 1)):
                for _b in range(nb):
                    zz = ordered[ci][ptr[ci]]
                    ptr[ci] += 1
                    ops, pred[ci] = _block_ops(zz, pred[ci])
                    streams[ci].append(ops)

    dc_f: list[dict] = [{}, {}]
    ac_f: list[dict] = [{}, {}]
    for ci in range(3):
        cls = 0 if ci == 0 else 1
        for ops in streams[ci]:
            for op in ops:
                f = dc_f[cls] if op[0] == "dc" else ac_f[cls]
                key = op[1]
                f[key] = f.get(key, 0) + 1
    tables = {}
    for cls in (0, 1):
        tables[("dc", cls)] = _build_table(dc_f[cls])
        tables[("ac", cls)] = _build_table(ac_f[cls])
    enc = {k: _canonical_codes(*v) for k, v in tables.items()}

    # pass 2: entropy-coded MCU interleave (same order), RSTn between
    # restart intervals
    bw = _BitWriter()
    idx = [0, 0, 0]
    mcu_i = 0
    rst = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.marker(0xD0 + rst % 8)
                rst += 1
            mcu_i += 1
            for ci in range(3):
                cls = 0 if ci == 0 else 1
                nb = hs * vs if ci == 0 else 1
                for _b in range(nb):
                    for op in streams[ci][idx[ci]]:
                        if op[0] == "dc":
                            _, size, bits = op
                            code, ln = enc[("dc", cls)][size]
                            bw.write(code, ln)
                            bw.write(bits, size)
                        else:
                            _, sym, size, bits = op
                            code, ln = enc[("ac", cls)][sym]
                            bw.write(code, ln)
                            bw.write(bits, size)
                    idx[ci] += 1
    entropy = bw.flush()

    # ---- markers
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, qt in ((0, quant_luma), (1, quant_chroma)):
        out += seg(0xFFDB, bytes([qid]) + bytes(qt.reshape(-1)[_INV_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hs << 4) | vs, 0])   # Y
    sof += bytes([2, 0x11, 1])             # Cb
    sof += bytes([3, 0x11, 1])             # Cr
    out += seg(0xFFC0, sof)
    for (kind, cls), (bits, vals) in tables.items():
        tc = 0 if kind == "dc" else 1
        out += seg(0xFFC4, bytes([(tc << 4) | cls]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(
    img: np.ndarray, quant: np.ndarray = _QUANT_LUMA
) -> bytes:
    """uint8 (h, w) grayscale -> single-component baseline JPEG (exercises
    the decoder's nc=1 path)."""
    h, w = img.shape
    plane = _pad_to(img.astype(np.float64), 8, 8)
    q = quant.astype(np.float64)
    blocks = _blocks(plane)
    pred = 0
    streams: list[list[tuple]] = []
    for by in range(blocks.shape[0]):
        for bx in range(blocks.shape[1]):
            f = _A @ (blocks[by, bx] - 128.0) @ _A.T
            zz = np.round(f / q).astype(np.int64).reshape(-1)[_INV_ZZ]
            ops, pred = _block_ops(zz, pred)
            streams.append(ops)
    dc_f: dict[int, int] = {}
    ac_f: dict[int, int] = {}
    for ops in streams:
        for op in ops:
            f = dc_f if op[0] == "dc" else ac_f
            f[op[1]] = f.get(op[1], 0) + 1
    dct = _build_table(dc_f)
    act = _build_table(ac_f)
    enc_dc = _canonical_codes(*dct)
    enc_ac = _canonical_codes(*act)
    bw = _BitWriter()
    for ops in streams:
        for op in ops:
            if op[0] == "dc":
                _, size, bits = op
                code, ln = enc_dc[size]
            else:
                _, sym, size, bits = op
                code, ln = enc_ac[sym]
            bw.write(code, ln)
            bw.write(bits, size)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes(quant.reshape(-1)[_INV_ZZ].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(dct[0]) + bytes(dct[1]))
    out += seg(0xFFC4, bytes([0x10]) + bytes(act[0]) + bytes(act[1]))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ decode


def _scan_geometry(comps: list[dict], h: int, w: int) -> dict:
    """MCU grid + per-component block dims. ``grid`` dims cover the padded
    MCU lattice (what interleaved scans code, dummy blocks included);
    ``used`` dims cover ceil(component_size/8) (what NON-interleaved scans
    code — strictly smaller for a full-res component under subsampling
    when the image width is not an MCU multiple, spec A.2.2)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geo = {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
           "grid": [], "used": []}
    for c in comps:
        gw, gh = mcus_x * c["h"], mcus_y * c["v"]
        uw = -(-(-(-w * c["h"] // hmax)) // 8)
        uh = -(-(-(-h * c["v"] // vmax)) // 8)
        geo["grid"].append((gh, gw))
        geo["used"].append((min(uh, gh), min(uw, gw)))
    return geo


def _next_marker(payload: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next real marker byte pair."""
    while pos < len(payload) - 1:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00:
            return pos
        pos += 1
    return len(payload)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG -> uint8 (h, w, 3) RGB. Baseline (SOF0/1) AND progressive
    (SOF2: spectral selection + successive approximation, DC and AC
    first/refinement scans, EOB runs) — tables read from the file, 1 or 3
    components, sampling factors 1-2, restart markers. Hierarchical /
    lossless / arithmetic-coded SOFs raise ValueError."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    coefs: list[np.ndarray] = []
    geo: dict | None = None
    h = w = None
    restart_interval = 0
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=i + 1)
                # DQT stores zigzag order; natural[n] = zz[zigzag_pos(n)]
                qtabs[tq] = zz.astype(np.float64)[_ZZ_FLAT].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            geo = _scan_geometry(comps, h, w)
            coefs = [
                np.zeros((gh, gw, 64), dtype=np.int64) for gh, gw in geo["grid"]
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if geo is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_cis = []
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tables >> 4, tables & 0x0F
                        scan_cis.append(ci)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan(
                payload, pos + seglen, comps, coefs, geo, htabs,
                scan_cis, ss, se, ah, al, restart_interval,
            )
            continue
        pos += seglen
    if geo is None or not coefs:
        raise ValueError("JPEG missing SOF/SOS")
    return _reconstruct(h, w, comps, coefs, geo, qtabs)


def _decode_scan(
    payload, pos, comps, coefs, geo, htabs, scan_cis, ss, se, ah, al,
    restart_interval,
):
    """One entropy-coded scan into the coefficient arrays (zigzag order per
    block). Handles baseline full-band scans and all four progressive scan
    shapes (T.81 G.1.2). Returns the payload position of the next marker."""
    br = _BitReader(payload, pos)
    interleaved = len(scan_cis) > 1
    pred = {ci: 0 for ci in scan_cis}
    state = {"eobrun": 0}

    def units():
        """Yield lists of (ci, by, bx) — one list per restart unit (MCU for
        interleaved scans, one block otherwise)."""
        if interleaved:
            for my in range(geo["mcus_y"]):
                for mx in range(geo["mcus_x"]):
                    unit = []
                    for ci in scan_cis:
                        c = comps[ci]
                        for b in range(c["h"] * c["v"]):
                            unit.append(
                                (ci, my * c["v"] + b // c["h"],
                                 mx * c["h"] + b % c["h"])
                            )
                    yield unit
        else:
            ci = scan_cis[0]
            uh, uw = geo["used"][ci]
            for by in range(uh):
                for bx in range(uw):
                    yield [(ci, by, bx)]

    n_done = 0
    for unit in units():
        if restart_interval and n_done and n_done % restart_interval == 0:
            br.align_to_marker()
            pred = {ci: 0 for ci in scan_cis}
            state["eobrun"] = 0
        n_done += 1
        for ci, by, bx in unit:
            c = comps[ci]
            zz = coefs[ci][by, bx]
            if ss == 0 and ah == 0:
                # DC first (progressive) or full-band (baseline)
                dct = htabs[(0, c["td"])]
                size = _read_huff_symbol(br, dct)
                pred[ci] += _extend(br.read(size), size)
                zz[0] = pred[ci] << al
                if se > 0:  # baseline full-band: AC follows inline
                    act = htabs[(1, c["ta"])]
                    k = 1
                    while k <= se:
                        sym = _read_huff_symbol(br, act)
                        if sym == 0x00:
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if sym == 0xF0:
                            k += 16
                            continue
                        k += run
                        if k > se:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.read(size), size)
                        k += 1
            elif ss == 0:  # DC refinement: one raw bit per block
                zz[0] |= br.read(1) << al
            elif ah == 0:
                _ac_first(br, zz, htabs[(1, c["ta"])], ss, se, al, state)
            else:
                _ac_refine(br, zz, htabs[(1, c["ta"])], ss, se, al, state)
    return _next_marker(payload, br.pos)


def _ac_first(br, zz, act, ss, se, al, state):
    """Progressive AC initial scan (G.1.2.2): run/size symbols with EOB-run
    extension; coefficients arrive at precision ``al``."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = _read_huff_symbol(br, act)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(br.read(s), s) << al
        k += 1


def _ac_refine(br, zz, act, ss, se, al, state):
    """Progressive AC refinement scan (G.1.2.3): newly-significant
    coefficients arrive as ±1<<al; already-nonzero coefficients receive one
    correction bit each (append 1<<al toward larger magnitude when set)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(idx):
        if br.read(1) and (zz[idx] & p1) == 0:
            zz[idx] += p1 if zz[idx] >= 0 else m1

    k = ss
    if state["eobrun"] > 0:
        # block inside an EOB run: correction bits only, then consume one
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1
        return
    eob_hit = False
    while k <= se:
        sym = _read_huff_symbol(br, act)
        r, s = sym >> 4, sym & 0x0F
        newval = 0
        if s == 0:
            if r != 15:
                # EOB_r ends THIS block and skips (1<<r)-1+extra more
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read(r)
                eob_hit = True
                break
            # r == 15: pass over 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("refinement size must be 1")
            newval = p1 if br.read(1) else m1
        while k <= se:
            if zz[k] != 0:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            zz[k] = newval
        k += 1
    if eob_hit:
        # the ending block still carries correction bits for its remaining
        # nonzero-history coefficients (the run count covers FURTHER blocks)
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1


def _reconstruct(h, w, comps, coefs, geo, qtabs):
    """Dequantize + IDCT every block, upsample chroma, color-convert."""
    planes = []
    for ci, c in enumerate(comps):
        gh, gw = geo["grid"][ci]
        q = qtabs[c["tq"]]
        plane = np.empty((gh * 8, gw * 8))
        for by in range(gh):
            for bx in range(gw):
                block = coefs[ci][by, bx][_ZZ_FLAT].reshape(8, 8) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ block @ _A + 128.0
                )
        planes.append(plane)
    full = []
    for c, p in zip(comps, planes):
        ry, rx = geo["vmax"] // c["v"], geo["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# ------------------------------------------------- progressive encoder


def _flush_eobrun(tokens, state):
    n = state["eobrun"]
    if n == 0:
        return
    r = n.bit_length() - 1
    tokens.append(("sym", r << 4))
    if r:
        tokens.append(("bits", n - (1 << r), r))
    tokens.extend(state["br"])
    state["br"] = []
    state["eobrun"] = 0


def _ac_first_block_tokens(zz, ss, se, al, tokens, state):
    """Inverse of _ac_first for one block (values at precision ``al``)."""
    vals = []
    for k in range(ss, se + 1):
        c = int(zz[k])
        v = (abs(c) >> al)
        vals.append(-v if c < 0 else v)
    last_nz = -1
    for i, v in enumerate(vals):
        if v != 0:
            last_nz = i
    if last_nz < 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(tokens, state)
        return
    _flush_eobrun(tokens, state)
    r = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            tokens.append(("sym", 0xF0))
            r -= 16
        size, bits = _magnitude(v)
        tokens.append(("sym", (r << 4) | size))
        tokens.append(("bits", bits, size))
        r = 0
    if last_nz < se - ss:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(tokens, state)


def _ac_refine_block_tokens(zz, ss, se, al, tokens, state):
    """Inverse of _ac_refine for one block (G.1.2.3): newly-significant
    coefficients as (run,1)+sign; correction bits for history coefficients
    buffer and flush with the NEXT emitted symbol, and ZRLs drain at every
    nonzero position — the decoder's walk passes history coefficients
    without consuming run, so the encoder must emit a ZRL the moment the
    pending run exceeds 15 zeros BEFORE any nonzero (history included), not
    only at the next newly-significant coefficient."""
    vals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_i = -1
    for i, v in enumerate(vals):
        if v == 1:
            eob_i = i
    r = 0
    pending: list = []
    for i, v in enumerate(vals):
        if v == 0:
            r += 1
            continue
        # drain ZRLs unless the remaining zeros fold into the EOB run
        while r > 15 and i <= eob_i:
            _flush_eobrun(tokens, state)
            tokens.append(("sym", 0xF0))
            tokens.extend(pending)
            pending = []
            r -= 16
        if v > 1:  # history coefficient: one correction bit, run unaffected
            pending.append(("bits", v & 1, 1))
            continue
        # newly significant
        _flush_eobrun(tokens, state)
        tokens.append(("sym", (r << 4) | 1))
        tokens.append(("bits", 1 if int(zz[ss + i]) > 0 else 0, 1))
        tokens.extend(pending)
        pending = []
        r = 0
    if r > 0 or pending:
        state["eobrun"] += 1
        state["br"].extend(pending)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(tokens, state)


def encode_jpeg_progressive(
    img: np.ndarray,
    subsampling: str = "4:4:4",
    quant_luma: np.ndarray = _QUANT_LUMA,
    quant_chroma: np.ndarray = _QUANT_CHROMA,
) -> bytes:
    """uint8 (h, w, 3) RGB -> PROGRESSIVE (SOF2) JPEG with the classic scan
    script: DC first at Al=1 + DC refinement, then per-component AC first
    scans (spectral 1-63) at Al=1 and AC refinement scans down to Al=0 —
    every decoder branch (successive approximation, spectral selection,
    EOB runs, correction bits) is exercised by its output."""
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    if subsampling == "4:2:0":
        hs = vs = 2
    elif subsampling == "4:4:4":
        hs = vs = 1
    else:
        raise ValueError(f"unsupported subsampling {subsampling}")

    y = _pad_to(ycc[:, :, 0], 8 * vs, 8 * hs)
    cbf = _pad_to(ycc[:, :, 1], 8 * vs, 8 * hs)
    crf = _pad_to(ycc[:, :, 2], 8 * vs, 8 * hs)
    if hs == 2:
        cb = cbf.reshape(cbf.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        cr = crf.reshape(crf.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
    else:
        cb, cr = cbf, crf

    q = [quant_luma.astype(np.float64), quant_chroma.astype(np.float64)]
    comps_meta = [
        {"id": 1, "h": hs, "v": vs, "tq": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 1},
        {"id": 3, "h": 1, "v": 1, "tq": 1},
    ]
    grids = []
    for plane, qid in ((y, 0), (cb, 1), (cr, 1)):
        blocks = _blocks(plane)
        g = np.empty((blocks.shape[0], blocks.shape[1], 64), dtype=np.int64)
        for by in range(blocks.shape[0]):
            for bx in range(blocks.shape[1]):
                f = _A @ (blocks[by, bx] - 128.0) @ _A.T
                g[by, bx] = np.round(f / q[qid]).astype(np.int64).reshape(-1)[_INV_ZZ]
        grids.append(g)
    geo = _scan_geometry(comps_meta, h, w)

    def mcu_blocks():
        for my in range(geo["mcus_y"]):
            for mx in range(geo["mcus_x"]):
                for ci, c in enumerate(comps_meta):
                    for b in range(c["h"] * c["v"]):
                        yield ci, my * c["v"] + b // c["h"], mx * c["h"] + b % c["h"]

    def used_blocks(ci):
        uh, uw = geo["used"][ci]
        for by in range(uh):
            for bx in range(uw):
                yield grids[ci][by, bx]

    # ---- build scans as token lists
    scans = []  # (scan_comps=[(ci, td, ta)], ss, se, ah, al, tokens, table_kind)
    DC_AL, AC_AL = 1, 1

    # DC first (interleaved, shared dc table 0)
    tokens: list = []
    pred = [0, 0, 0]
    for ci, by, bx in mcu_blocks():
        v = int(grids[ci][by, bx][0]) >> DC_AL
        size, bits = _magnitude(v - pred[ci])
        pred[ci] = v
        tokens.append(("sym", size))
        tokens.append(("bits", bits, size))
    scans.append(([0, 1, 2], 0, 0, 0, DC_AL, tokens, "dc"))

    # DC refinement (raw bits, no table)
    tokens = []
    for ci, by, bx in mcu_blocks():
        tokens.append(("bits", (int(grids[ci][by, bx][0]) >> 0) & 1, 1))
    scans.append(([0, 1, 2], 0, 0, DC_AL, 0, tokens, None))

    # AC first + refinement per component
    for ci in range(3):
        tokens = []
        state = {"eobrun": 0, "br": []}
        for zz in used_blocks(ci):
            _ac_first_block_tokens(zz, 1, 63, AC_AL, tokens, state)
        _flush_eobrun(tokens, state)
        scans.append(([ci], 1, 63, 0, AC_AL, tokens, "ac"))
    for ci in range(3):
        tokens = []
        state = {"eobrun": 0, "br": []}
        for zz in used_blocks(ci):
            _ac_refine_block_tokens(zz, 1, 63, 0, tokens, state)
        _flush_eobrun(tokens, state)
        scans.append(([ci], 1, 63, AC_AL, 0, tokens, "ac"))

    # ---- serialize
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, qt in ((0, quant_luma), (1, quant_chroma)):
        out += seg(0xFFDB, bytes([qid]) + bytes(qt.reshape(-1)[_INV_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in comps_meta:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xFFC2, sof)  # SOF2: progressive

    for scan_cis, ss, se, ah, al, tokens, kind in scans:
        if kind is not None:
            freqs: dict[int, int] = {}
            for t in tokens:
                if t[0] == "sym":
                    freqs[t[1]] = freqs.get(t[1], 0) + 1
            bits_vals = _build_table(freqs)
            enc = _canonical_codes(*bits_vals)
            tc = 0 if kind == "dc" else 1
            out += seg(0xFFC4, bytes([(tc << 4) | 0]) + bytes(bits_vals[0])
                       + bytes(bits_vals[1]))
        else:
            enc = {}
        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            sos += bytes([comps_meta[ci]["id"], 0x00])  # td=0, ta=0
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)
        bw = _BitWriter()
        for t in tokens:
            if t[0] == "sym":
                code, ln = enc[t[1]]
                bw.write(code, ln)
            else:
                _, val, nb = t
                bw.write(val, nb)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
