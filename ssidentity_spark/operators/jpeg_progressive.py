"""Progressive JPEG (SOF2, Huffman) codec — dependency-free, closing the
image-format boundary next to the baseline codec (operators/jpeg.py).

Supported on decode: spectral selection (per-scan Ss..Se coefficient
bands), successive approximation for DC and AC (Ah/Al bit-plane
refinement with the spec's EOB-run + correction-bit protocol, ITU T.81
§G.2), multiple DHT segments between scans, grayscale and YCbCr color
with sampling up to 2×2, INTERLEAVED DC scans (MCU-ordered multi-
component scans with dummy-block handling — the form libjpeg emits by
default; r7), and restart intervals (DRI/RSTn) in both interleaved and
single-component scans with per-boundary predictor/EOB-run reset (r7).
AC scans are single-component per T.81 (an interleaved AC scan is
invalid in progressive mode and is rejected as such); arithmetic coding
raises NotImplementedError.

Encoder twin: ``encode_jpeg_progressive`` writes a libjpeg-style script —
per component: DC first pass at Al=1, AC band first passes at Al=1
(spectral split 1-5 / 6-63), then DC and AC refinement passes to Al=0 —
implementing the §G.1.2 successive-approximation entropy coder (EOB-run
accumulation across blocks, buffered correction bits). Because the
final refinement reaches Al=0, the progression is exactly lossless down
to quantization: decode∘encode meets the same error bounds as the
baseline codec, which is the property the tests pin.

All scan passes mutate per-component quantized-coefficient arrays; the
final reconstruction (dequantize → dezigzag → IDCT → upsample → YCbCr→
RGB) is shared logic with the baseline decoder's math.
"""

from __future__ import annotations

import struct

import numpy as np

from ssidentity_spark.operators.jpeg import (
    _C,
    _ZIGZAG,
    _amplitude,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _category,
    _emit_restart,
    _extend,
    _flat_huffman,
    _huff_decode,
    _rgb_to_ycbcr,
    _seg,
    _ycbcr_to_rgb,
)

MAX_EOBRUN = 0x7FFF  # spec ceiling for an EOB run (14-bit extension)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _entropy_end(data: bytes, i: int) -> int:
    """First offset at or after ``i`` holding a real marker (not a stuffed
    0xFF00 pair, not an RSTn)."""
    while i + 1 < len(data):
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return len(data)


def _refine_nonzero(br: _BitReader, coefzz, k: int, p1: int, m1: int) -> None:
    """One AC correction bit for an already-nonzero coefficient."""
    if br.read_bit():
        if (int(coefzz[k]) & p1) == 0:
            coefzz[k] += p1 if coefzz[k] >= 0 else m1


def decode_progressive_pixels(payload: bytes) -> np.ndarray:
    """Full SOF2 decode: (h × w) grayscale or (h × w × 3) RGB floats."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    dims = None
    comps: list[dict] | None = None
    coefs: list[np.ndarray] = []
    hmax = vmax = 1
    dri = 0  # restart interval in MCUs (blocks for single-component scans)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("malformed JPEG segment stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise NotImplementedError("truncated JPEG segment stream")
        if marker == 0xDB:
            b = body
            while b:
                if len(b) < 65 or b[0] >> 4 != 0:
                    raise NotImplementedError("unsupported JPEG DQT segment")
                quant[b[0] & 0x0F] = list(b[1:65])
                b = b[65:]
        elif marker == 0xC2:  # SOF2 progressive
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if ncomp not in (1, 3):
                raise NotImplementedError("1- or 3-component SOF2 only")
            comps = []
            for ci in range(ncomp):
                cid, samp, qt = body[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = samp >> 4, samp & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError("sampling beyond 2x2 unsupported")
                comps.append({"cid": cid, "h": ch, "v": cv, "qt": qt})
            if ncomp == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            dims = (w, h)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                cw = (w * c["h"] + hmax - 1) // hmax
                chh = (h * c["v"] + vmax - 1) // vmax
                c["bx"] = (cw + 7) // 8
                c["by"] = (chh + 7) // 8
                c["cw"], c["ch"] = cw, chh
                coefs.append(np.zeros((c["by"], c["bx"], 64), dtype=np.int32))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("decode_progressive_pixels handles SOF2 only")
        elif marker == 0xC4:
            b = body
            while b:
                if len(b) < 17:
                    raise NotImplementedError("truncated JPEG DHT segment")
                cls, tid = b[0] >> 4, b[0] & 0x0F
                counts = list(b[1:17])
                n = sum(counts)
                huff[(cls, tid)] = _canonical_codes(counts, b[17 : 17 + n])
                b = b[17 + n :]
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if comps is None:
                raise NotImplementedError("JPEG SOS before SOF2")
            ns = body[0]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if not (
                (ss == 0 and se == 0) or (1 <= ss <= se <= 63)
            ) or (ah and ah != al + 1):
                raise NotImplementedError("invalid progressive scan parameters")
            start = pos + 2 + ln
            end = _entropy_end(payload, start)
            br = _BitReader(payload[start:end])
            if ns == 1:
                cid = body[1]
                td, ta = body[2] >> 4, body[2] & 0x0F
                ci = next(
                    (i for i, c in enumerate(comps) if c["cid"] == cid), None
                )
                if ci is None:
                    raise NotImplementedError("JPEG scan names unknown component")
                _decode_scan(
                    br, comps[ci], coefs[ci], huff, td, ta, ss, se, ah, al, dri
                )
            else:
                # interleaved scan: T.81 allows it in progressive mode for
                # the DC band only (AC scans are always single-component)
                if ss != 0 or se != 0:
                    raise NotImplementedError(
                        "interleaved progressive AC scan is not valid T.81"
                    )
                scan = []
                for si in range(ns):
                    cid = body[1 + 2 * si]
                    td = body[2 + 2 * si] >> 4
                    ci = next(
                        (i for i, c in enumerate(comps) if c["cid"] == cid),
                        None,
                    )
                    if ci is None:
                        raise NotImplementedError(
                            "JPEG scan names unknown component"
                        )
                    scan.append((ci, td))
                _decode_dc_interleaved(
                    br, scan, comps, coefs, huff, ah, al, dims, hmax, vmax, dri
                )
            pos = end
            continue
        pos += 2 + ln
    if dims is None or comps is None:
        raise NotImplementedError("JPEG missing SOF2/SOS segments")
    w, h = dims

    # reconstruction: dequantize + dezigzag + IDCT per block, then upsample
    full = []
    for ci, c in enumerate(comps):
        if c["qt"] not in quant:
            raise NotImplementedError("JPEG scan references missing quant table")
        q = np.array(quant[c["qt"]], dtype=np.float64)
        plane = np.zeros((c["by"] * 8, c["bx"] * 8))
        for byi in range(c["by"]):
            for bxi in range(c["bx"]):
                zz = coefs[ci][byi, bxi].astype(np.float64) * q
                coef = np.zeros(64)
                for k, zi in enumerate(_ZIGZAG):
                    coef[zi] = zz[k]
                plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] = (
                    _C.T @ coef.reshape(8, 8) @ _C + 128.0
                )
        p = plane[: c["ch"], : c["cw"]]
        p = np.repeat(
            np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0], 0, 255)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_dc_interleaved(
    br, scan, comps, coefs, huff, ah, al, dims, hmax, vmax, dri
) -> None:
    """Interleaved DC scan (first pass or refinement) in MCU order: per
    MCU, each scan component contributes its h×v block cluster. Block
    grids are MCU-aligned per T.81 — clusters past a component's true
    by×bx still carry entropy data (dummy blocks), which is consumed and
    discarded. Restart boundaries every ``dri`` MCUs reset every DC
    predictor and byte-align over the RSTn marker."""
    w, h = dims
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    dc_codes = {}
    if ah == 0:
        for ci, td in scan:
            if (0, td) not in huff:
                raise NotImplementedError("JPEG scan references missing DC table")
            dc_codes[ci] = huff[(0, td)]
    pred = {ci: 0 for ci, _ in scan}
    rst = 0
    mcu_i = 0
    for my in range(mcy):
        for mx in range(mcx):
            if dri and mcu_i and mcu_i % dri == 0:
                br.align_restart()
                rst = (rst + 1) % 8
                pred = {ci: 0 for ci, _ in scan}
            mcu_i += 1
            for ci, _td in scan:
                c = comps[ci]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        byi = my * c["v"] + v
                        bxi = mx * c["h"] + hh
                        in_range = byi < c["by"] and bxi < c["bx"]
                        if ah == 0:
                            s = _huff_decode(br, dc_codes[ci])
                            pred[ci] += _extend(br.read_bits(s), s)
                            if in_range:
                                coefs[ci][byi, bxi, 0] = pred[ci] << al
                        else:
                            bit = br.read_bit()
                            if bit and in_range:
                                coefs[ci][byi, bxi, 0] |= 1 << al


def _decode_scan(br, c, coef, huff, td, ta, ss, se, ah, al, dri=0) -> None:
    """Apply one single-component scan to the coefficient array. For
    non-interleaved scans the restart unit is ONE BLOCK (T.81: the MCU of
    a single-component scan is a single data unit); every ``dri`` blocks
    the decoder byte-aligns over the RSTn marker and resets the DC
    predictor / EOB run."""
    n_blocks = c["by"] * c["bx"]

    state = {"pred": 0, "eobrun": 0, "i": 0}

    def blocks():
        for byi in range(c["by"]):
            for bxi in range(c["bx"]):
                if dri and state["i"] and state["i"] % dri == 0:
                    br.align_restart()
                    state["pred"] = 0
                    state["eobrun"] = 0
                state["i"] += 1
                yield coef[byi, bxi]

    if ss == 0:  # DC scan
        if ah == 0:  # first pass: Huffman diff of (DC >> Al)
            if (0, td) not in huff:
                raise NotImplementedError("JPEG scan references missing DC table")
            dc_codes = huff[(0, td)]
            for zz in blocks():
                s = _huff_decode(br, dc_codes)
                state["pred"] += _extend(br.read_bits(s), s)
                zz[0] = state["pred"] << al
        else:  # refinement: one raw bit per block
            for zz in blocks():
                if br.read_bit():
                    zz[0] |= 1 << al
        return

    if (1, ta) not in huff:
        raise NotImplementedError("JPEG scan references missing AC table")
    ac_codes = huff[(1, ta)]
    if ah == 0:  # AC first pass: EOB runs + shifted coefficients
        for zz in blocks():
            if state["eobrun"]:
                state["eobrun"] -= 1
                continue
            k = ss
            while k <= se:
                sym = _huff_decode(br, ac_codes)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    state["eobrun"] = (1 << r) - 1 + (br.read_bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise NotImplementedError("JPEG AC coefficient overflow")
                zz[k] = _extend(br.read_bits(s), s) << al
                k += 1
        if n_blocks == 0:
            return
        return

    # AC refinement pass (T.81 §G.2 / the libjpeg decode_mcu_AC_refine walk)
    p1, m1 = 1 << al, -1 << al
    for zz in blocks():
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = _huff_decode(br, ac_codes)
                r, s = sym >> 4, sym & 0x0F
                sval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + (br.read_bits(r) if r else 0)
                        break
                    # ZRL: skip 16 zero-history positions below
                else:
                    if s != 1:
                        raise NotImplementedError(
                            "invalid JPEG AC refinement symbol"
                        )
                    sval = p1 if br.read_bit() else m1
                # advance r zero-history positions, correcting nonzero ones
                while k <= se:
                    if zz[k] != 0:
                        _refine_nonzero(br, zz, k, p1, m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if sval and k <= se:
                    zz[k] = sval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(br, zz, k, p1, m1)
                k += 1
            state["eobrun"] -= 1


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------


def _prog_ac_table():
    """Flat AC table covering the progressive alphabet: (run, size) for
    size 1-10 plus ALL EOBn symbols (r<<4, r = 0..14) and ZRL."""
    syms = sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {r << 4 for r in range(15)}
        | {0xF0}
    )
    return _flat_huffman(syms, 9)


class _ScanWriter:
    """Entropy state for one progressive scan: EOB-run accumulation plus
    the spec's TWO correction-bit buffers (§G.1.2.3 / libjpeg's BE and
    BR): ``pending`` holds completed-EOB-blocks' bits, flushed with the
    EOBn symbol; ``buffered`` holds the CURRENT block's bits, flushed
    right after the next emitted symbol (the decoder reads them inside
    its post-symbol advance walk). At block end the current bits fold
    into the pending buffer."""

    def __init__(self, bw: _BitWriter, ac_table) -> None:
        self.bw = bw
        self.ac = ac_table
        self.eobrun = 0
        self.pending: list[int] = []  # bits of completed EOB blocks
        self.buffered: list[int] = []  # bits of the current block

    def _emit_sym(self, sym: int) -> None:
        code, ln = self.ac[sym]
        self.bw.write(code, ln)

    def flush_buffered(self) -> None:
        for b in self.buffered:
            self.bw.write(b, 1)
        self.buffered = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self._emit_sym(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending = []

    def end_block_eob(self) -> None:
        """The remainder of this block is an EOB: count it and carry its
        correction bits with the pending run."""
        self.eobrun += 1
        self.pending.extend(self.buffered)
        self.buffered = []
        if self.eobrun == MAX_EOBRUN:
            self.emit_eobrun()

    def end_scan(self) -> None:
        self.emit_eobrun()
        self.flush_buffered()
        self.bw.flush()


def _encode_ac_first(sw: _ScanWriter, zz, ss, se, al) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v >> al) if v >= 0 else -((-v) >> al)
        if t == 0:
            r += 1
            continue
        sw.emit_eobrun()
        while r > 15:
            sw._emit_sym(0xF0)
            r -= 16
        s = _category(t)
        sw._emit_sym((r << 4) | s)
        sw.bw.write(_amplitude(t, s), s)
        r = 0
    if r:
        sw.end_block_eob()


def _encode_ac_refine(sw: _ScanWriter, zz, ss, se, al) -> None:
    absv = {}
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            sw.emit_eobrun()  # completed blocks' run + their bits first
            sw._emit_sym(0xF0)
            r -= 16
            sw.flush_buffered()  # current block's bits ride AFTER the ZRL
        if t > 1:
            sw.buffered.append(t & 1)
            continue
        sw.emit_eobrun()
        sw._emit_sym((r << 4) | 1)
        sw.bw.write(0 if int(zz[k]) < 0 else 1, 1)
        sw.flush_buffered()  # and after symbol+sign for a new significant
        r = 0
    if r > 0 or sw.buffered:
        sw.end_block_eob()


def _component_coeffs(plane: np.ndarray, quant: int) -> np.ndarray:
    """Pad to block multiple (edge), DCT+quantize+zigzag per block →
    (by, bx, 64) int array."""
    hh, ww = plane.shape
    by, bx = (hh + 7) // 8, (ww + 7) // 8
    padded = np.pad(plane, ((0, by * 8 - hh), (0, bx * 8 - ww)), mode="edge")
    q = np.full(64, quant, dtype=np.float64)
    out = np.zeros((by, bx, 64), dtype=np.int32)
    for byi in range(by):
        for bxi in range(bx):
            block = padded[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] - 128.0
            coef = _C @ block @ _C.T
            zz = np.array([coef.flat[i] for i in _ZIGZAG])
            out[byi, bxi] = np.round(zz / q).astype(np.int32)
    return out


AL1 = 1  # first-pass bit shift; refinement passes bring it to 0
AC_BANDS = ((1, 5), (6, 63))  # spectral split for the AC scans


def encode_jpeg_progressive(
    pixels,
    quant: int = 1,
    subsample: bool = False,
    interleave_dc: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode gray (h×w) or RGB (h×w×3) pixels as progressive JPEG with
    the full successive-approximation script (see module docstring).

    ``interleave_dc=True`` (color only) emits the DC scans in the
    INTERLEAVED form real progressive encoders default to — one scan
    covering all three components in MCU order, dummy blocks included
    for subsampled chroma per T.81. ``restart_interval > 0`` writes a
    DRI segment and RSTn markers every that-many restart units (MCUs for
    interleaved scans, blocks for single-component scans), with DC
    predictors and EOB runs reset at each boundary."""
    arr = np.asarray(pixels, dtype=np.float64)
    color = arr.ndim == 3
    h, w = arr.shape[:2]
    if color:
        # non-interleaved scans size each component's block grid from its
        # OWN dims (ceil(comp/8)) — so planes are cropped to true
        # component dims here and _component_coeffs edge-pads per plane;
        # only the chroma box-mean needs an even-dim source
        ph, pw = h + (h & 1), w + (w & 1)
        arr = np.pad(arr, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        y, cb, cr = _rgb_to_ycbcr(arr)
        y = y[:h, :w]
        if subsample:
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        else:
            cb, cr = cb[:h, :w], cr[:h, :w]
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        qids = [0, 1, 1]
        cids = [1, 2, 3]
    else:
        planes = [arr]
        samp = [(1, 1)]
        qids = [0]
        cids = [1]

    coefs = [_component_coeffs(p, quant) for p in planes]

    dc_syms = list(range(12))
    dc_table, dc_dht = _flat_huffman(dc_syms, 4)
    ac_table, ac_dht = _prog_ac_table()

    def sos(ci: int, ss: int, se: int, ah: int, al: int, body_bits: bytes) -> bytes:
        hdr = _seg(
            0xFFDA,
            bytes([1, cids[ci], 0x00, ss, se, (ah << 4) | al]),
        )
        return hdr + body_bits

    scans = []
    rst_n = restart_interval

    def dc_first(ci: int) -> bytes:
        bw = _BitWriter()
        pred = 0
        rst = 0
        i = 0
        cz = coefs[ci]
        for byi in range(cz.shape[0]):
            for bxi in range(cz.shape[1]):
                if rst_n and i and i % rst_n == 0:
                    _emit_restart(bw, rst)
                    rst += 1
                    pred = 0
                i += 1
                dc = int(cz[byi, bxi, 0]) >> AL1
                diff = dc - pred
                pred = dc
                s = _category(diff)
                code, ln = dc_table[s]
                bw.write(code, ln)
                bw.write(_amplitude(diff, s), s)
        bw.flush()
        return sos(ci, 0, 0, 0, AL1, bytes(bw.out))

    def dc_refine(ci: int) -> bytes:
        bw = _BitWriter()
        rst = 0
        i = 0
        cz = coefs[ci]
        for byi in range(cz.shape[0]):
            for bxi in range(cz.shape[1]):
                if rst_n and i and i % rst_n == 0:
                    _emit_restart(bw, rst)
                    rst += 1
                i += 1
                bw.write((int(cz[byi, bxi, 0]) >> 0) & 1, 1)
        bw.flush()
        return sos(ci, 0, 0, 1, 0, bytes(bw.out))

    def _mcu_geometry():
        hs = [s[0] for s in samp]
        vs = [s[1] for s in samp]
        hmax, vmax = max(hs), max(vs)
        mcx = (w + 8 * hmax - 1) // (8 * hmax)
        mcy = (h + 8 * vmax - 1) // (8 * vmax)
        return mcx, mcy

    def dc_interleaved(first: bool) -> bytes:
        """One DC scan covering ALL components in MCU order (the form
        libjpeg emits by default). Dummy blocks past a component's true
        grid carry diff=0 / bit=0 — consumed and discarded by decoders."""
        bw = _BitWriter()
        mcx, mcy = _mcu_geometry()
        pred = [0] * n
        rst = 0
        mcu_i = 0
        for my in range(mcy):
            for mx in range(mcx):
                if rst_n and mcu_i and mcu_i % rst_n == 0:
                    _emit_restart(bw, rst)
                    rst += 1
                    pred = [0] * n
                mcu_i += 1
                for ci in range(n):
                    ch, cv = samp[ci]
                    cz = coefs[ci]
                    for v in range(cv):
                        for hh in range(ch):
                            byi, bxi = my * cv + v, mx * ch + hh
                            in_range = byi < cz.shape[0] and bxi < cz.shape[1]
                            if first:
                                dc = (
                                    int(cz[byi, bxi, 0]) >> AL1
                                    if in_range
                                    else pred[ci]
                                )
                                diff = dc - pred[ci]
                                pred[ci] = dc
                                s = _category(diff)
                                code, ln = dc_table[s]
                                bw.write(code, ln)
                                bw.write(_amplitude(diff, s), s)
                            else:
                                bit = (
                                    int(cz[byi, bxi, 0]) & 1 if in_range else 0
                                )
                                bw.write(bit, 1)
        bw.flush()
        ah, al = (0, AL1) if first else (1, 0)
        comp_spec = b"".join(bytes([cids[ci], 0x00]) for ci in range(n))
        hdr = _seg(
            0xFFDA,
            bytes([n]) + comp_spec + bytes([0, 0, (ah << 4) | al]),
        )
        return hdr + bytes(bw.out)

    def ac_scan(ci: int, ss: int, se: int, first: bool) -> bytes:
        bw = _BitWriter()
        sw = _ScanWriter(bw, ac_table)
        rst = 0
        i = 0
        cz = coefs[ci]
        for byi in range(cz.shape[0]):
            for bxi in range(cz.shape[1]):
                if rst_n and i and i % rst_n == 0:
                    # EOB runs must not cross a restart boundary: close
                    # the run (flushing its carried correction bits),
                    # then byte-align + marker
                    sw.emit_eobrun()
                    sw.flush_buffered()
                    _emit_restart(bw, rst)
                    rst += 1
                i += 1
                if first:
                    _encode_ac_first(sw, cz[byi, bxi], ss, se, AL1)
                else:
                    _encode_ac_refine(sw, cz[byi, bxi], ss, se, 0)
        sw.end_scan()
        ah, al = (0, AL1) if first else (1, 0)
        return sos(ci, ss, se, ah, al, bytes(bw.out))

    n = len(planes)
    if interleave_dc and n > 1:
        scans.append(dc_interleaved(first=True))
    else:
        for ci in range(n):
            scans.append(dc_first(ci))
    for ci in range(n):
        for ss, se in AC_BANDS:
            scans.append(ac_scan(ci, ss, se, first=True))
    if interleave_dc and n > 1:
        scans.append(dc_interleaved(first=False))
    else:
        for ci in range(n):
            scans.append(dc_refine(ci))
    for ci in range(n):
        for ss, se in AC_BANDS:
            scans.append(ac_scan(ci, ss, se, first=False))

    zz_q = bytes([quant] * 64)
    out = b"\xff\xd8"
    out += _seg(0xFFDB, b"\x00" + zz_q)
    if color:
        out += _seg(0xFFDB, b"\x01" + zz_q)
    comp_bytes = b"".join(
        bytes([cids[ci], (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
        for ci in range(n)
    )
    out += _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, n) + comp_bytes)
    out += _seg(0xFFC4, b"\x00" + dc_dht)
    out += _seg(0xFFC4, b"\x10" + ac_dht)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += b"".join(scans)
    out += b"\xff\xd9"
    return out
