"""Lossless 10-bit plane pack for host<->device transfers.

The harness chip sits behind a relay link whose throughput (7-45 MB/s)
dwarfs every kernel cost, so the e2e encode/decode headline is decided
by bytes on the wire (the reference's analog is its zero-copy
in-process loop, /root/reference/lib/src/jpegr.cpp:167-247 — its
"link" is free). This module halves-to-quarters the raw 10-bit pixel
traffic losslessly:

  pack (host)    : vertical delta within 32-row groups -> zigzag ->
                   per-256-sample-segment bit width quantized to
                   {0,2,5,10} -> segments regrouped into one array per
                   width ("buckets"), each packed to u32 words in a
                   transposed slot layout the device can unpack with
                   static shifts.
  unpack (device): per-bucket elementwise shift/mask (no gathers) ->
                   one row-gather to restore segment order (~4 ms for
                   a 4K plane on v5e) -> log-doubling cumsum inside
                   each 32-row group (~3 ms) -> mod-1024.

Design constants were picked from on-chip measurements: a per-sample
gather of 18.8M indices costs ~128 ms (ruled out); a (74k, 256) row
gather costs ~3.9 ms; the grouped cumsum ~3.2 ms.

The same codec runs in reverse for decoded-pixel readback: the device
computes deltas + widths, the host fetches the (tiny) width map,
builds the plan, and a second dispatch packs into the bucketed layout
(parallel/sharding.py wires that path).
"""

from __future__ import annotations

import os
import time
from functools import lru_cache

import numpy as np

L = 256      # samples per segment (lane tile)
G = 32       # rows per delta group (row 0 of each group is raw)
WIDTHS = (2, 5, 10)          # nonzero packed widths; 0 = all-zero seg
_POW2_MIN = 256              # bucket-count quantization floor


def _slots(b: int) -> int:
    return 32 // b           # samples per u32 word (2->16, 5->6, 10->3)


def _wps(bw: int, l: int) -> int:
    """u32 words for l samples at bit width bw."""
    return -(-l // (32 // bw))


def _words_per_seg(b: int) -> int:
    return _wps(b, L)


def _pow2_pad(n: int, floor: int = _POW2_MIN) -> int:
    """Quantize bucket sizes so compiled unpack variants stay few:
    powers of two up to 2048, then multiples of 2048 (bounds padding
    waste at 2047 segments ~ 650 KB in the widest bucket)."""
    p = floor
    while p < n and p < 2048:
        p <<= 1
    if n <= p:
        return p
    return -(-n // 2048) * 2048


def _unpack_threads() -> int:
    """Host worker count for the native unpack hot paths; override
    with UHDR_UNPACK_THREADS (0/1 = serial)."""
    from ..utils.workers import worker_count

    return worker_count("UHDR_UNPACK_THREADS")


def _zigzag_deltas(arr: np.ndarray) -> np.ndarray:
    """(H, W) 10-bit values -> (H, W) zigzagged mod-1024 vertical
    deltas (u16, < 1024). Row r with r % G == 0 is raw (delta vs 0)."""
    h = arr.shape[0]
    prev = np.zeros_like(arr)
    prev[1:] = arr[:-1]
    prev[0::G] = 0
    d = (arr.astype(np.int32) - prev.astype(np.int32)) & 1023
    ds = ((d + 512) & 1023) - 512            # signed in [-512, 511]
    return ((ds << 1) ^ (ds >> 31)).astype(np.uint16)


class PackedPlane:
    """Host-side pack result. `plan` is the static shape key; the
    arrays are what actually crosses the link. Each h2d/d2h transfer
    on the relay costs ~30-150 ms of fixed overhead, so `to_blob`
    fuses everything into ONE u32 buffer (buckets then perm) that the
    device slices at plan-static offsets."""

    __slots__ = ("plan", "buckets", "perm")

    def __init__(self, plan, buckets, perm):
        self.plan = plan      # (H, W, Wp, n2p, n5p, n10p)
        self.buckets = buckets  # {b: u32 (nbp, words_per_seg(b))}
        self.perm = perm      # i32 (H * Wp // L,) row-gather indices

    def nbytes(self) -> int:
        return (sum(a.nbytes for a in self.buckets.values())
                + self.perm.nbytes)

    def to_blob(self) -> np.ndarray:
        return np.concatenate(
            [np.asarray(self.buckets[b]).ravel() for b in WIDTHS]
            + [self.perm.view(np.uint32)])


def _blob_offsets(plan):
    h, w, wp, n2, n5, n10 = plan
    sizes = [n2 * _words_per_seg(2), n5 * _words_per_seg(5),
             n10 * _words_per_seg(10), h * (wp // L)]
    offs = np.cumsum([0] + sizes).tolist()
    return offs  # [b2, b5, b10, perm, end]


def pack_plane_host(arr: np.ndarray) -> PackedPlane:
    """Pack a (H, W) array of 10-bit values (u16). H must be a
    multiple of G (pad beforehand if not); W is padded internally.
    Uses the single-pass native packer (jpeg/native/packio.cpp) when
    available — the numpy path below costs ~7 s for a 4-frame 4K P010
    batch on one core; bit-identical output either way."""
    h, w = arr.shape
    if h % G:
        raise ValueError(f"H={h} not a multiple of {G}")
    native_packed = _pack_plane_native(arr, h, w)
    if native_packed is not None:
        return native_packed
    wp = -(-w // L) * L
    if wp != w:
        arr = np.pad(arr, ((0, 0), (0, wp - w)), mode="edge")
    z = _zigzag_deltas(arr).reshape(h, wp // L, L)
    zmax = z.max(axis=2)                       # (h, wp//L)
    # width code per segment: 0, 2, 5 or 10
    b = np.zeros_like(zmax, dtype=np.uint8)
    b[zmax > 0] = 2
    b[zmax > 3] = 5
    b[zmax > 31] = 10
    flat_b = b.ravel()
    zseg = z.reshape(-1, L)

    buckets = {}
    perm = np.zeros(flat_b.size, np.int32)     # 0 -> the zeros row
    base = 1
    for bw in WIDTHS:
        idx = np.nonzero(flat_b == bw)[0]
        n = idx.size
        npad = _pow2_pad(max(n, 1))
        k = _slots(bw)
        nw = _words_per_seg(bw)
        sel = np.zeros((npad, k * nw), np.uint32)
        sel[:n, :L] = zseg[idx]
        words = (sel.reshape(npad, k, nw)
                 << (np.arange(k, dtype=np.uint32)[None, :, None] * bw)
                 ).sum(axis=1, dtype=np.uint32)
        buckets[bw] = words
        perm[idx] = base + np.arange(n, dtype=np.int32)
        base += npad
    plan = (h, w, wp, buckets[2].shape[0], buckets[5].shape[0],
            buckets[10].shape[0])
    return PackedPlane(plan, buckets, perm)


def _pack_plane_native(arr: np.ndarray, h: int, w: int):
    """Native two-sweep pack (uhdr_seg_widths + uhdr_seg_fill);
    returns a PackedPlane bit-identical to the numpy path, or None
    when the native library is unavailable."""
    from ..jpeg import native

    lib = native.get_lib()
    if lib is None or getattr(lib, "uhdr_seg_widths", None) is None:
        return None
    import ctypes

    a = np.ascontiguousarray(arr, dtype=np.uint16)
    nsegw = -(-w // L)
    bmap = np.empty(h * nsegw, np.uint8)
    counts = np.zeros(3, np.int64)
    u16p = a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    if lib.uhdr_seg_widths(
            u16p, h, w,
            bmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))) != 0:
        return None
    npads = np.asarray([_pow2_pad(max(int(c), 1)) for c in counts],
                       np.int64)
    nwords = sum(int(npads[j]) * _words_per_seg(bw)
                 for j, bw in enumerate(WIDTHS))
    blob = np.zeros(nwords, np.uint32)
    perm = np.zeros(h * nsegw, np.int32)
    if lib.uhdr_seg_fill(
            u16p, h, w,
            bmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            npads.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))) != 0:
        return None
    buckets = {}
    off = 0
    for j, bw in enumerate(WIDTHS):
        nw = _words_per_seg(bw)
        buckets[bw] = blob[off:off + int(npads[j]) * nw].reshape(
            int(npads[j]), nw)
        off += int(npads[j]) * nw
    wp = -(-w // L) * L
    plan = (h, w, wp, int(npads[0]), int(npads[1]), int(npads[2]))
    return PackedPlane(plan, buckets, perm)


@lru_cache(maxsize=None)
def _unpack_fn(plan):
    """Jitted device unpack for a given static plan; takes the fused
    u32 blob from PackedPlane.to_blob()."""
    import jax
    import jax.numpy as jnp

    h, w, wp, n2, n5, n10 = plan
    nsegw = wp // L
    offs = _blob_offsets(plan)
    counts = {2: n2, 5: n5, 10: n10}

    def unpack(blob):
        rows = [jnp.zeros((1, L), jnp.uint16)]
        for i, bw in enumerate(WIDTHS):
            nw = _words_per_seg(bw)
            wordsarr = blob[offs[i]:offs[i + 1]].reshape(counts[bw],
                                                        nw)
            k = _slots(bw)
            mask = jnp.uint32((1 << bw) - 1)
            parts = [((wordsarr >> (s * bw)) & mask).astype(jnp.uint16)
                     for s in range(k)]
            seg = jnp.concatenate(parts, axis=1)[:, :L]
            rows.append(seg)
        perm = jax.lax.bitcast_convert_type(blob[offs[3]:offs[4]],
                                            jnp.int32)
        allrows = jnp.concatenate(rows, axis=0)
        z = jnp.take(allrows, perm.reshape(h, nsegw), axis=0)
        z = z.reshape(h, wp).astype(jnp.int32)
        ds = (z >> 1) ^ -(z & 1)               # un-zigzag
        g = ds.reshape(h // G, G, wp)
        s = 1
        while s < G:
            g = g + jnp.pad(g, ((0, 0), (s, 0), (0, 0)))[:, :-s, :]
            s <<= 1
        vals = (g.reshape(h, wp) & 1023).astype(jnp.uint16)
        return vals[:, :w]

    return jax.jit(unpack)


def unpack_plane_device(packed: PackedPlane, blob_dev=None):
    """Reconstruct the plane on device from a PackedPlane (uploading
    its fused blob) or from an already-uploaded blob device array.
    Returns a device array (H, W) u16 with values < 1024."""
    fn = _unpack_fn(packed.plan)
    return fn(packed.to_blob() if blob_dev is None else blob_dev)


# ---------------------------------------------------------------------------
# Reverse direction: device pack for host readback.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _widths_fn(shape):
    """Jitted pass 1: zigzag deltas + per-segment width codes on
    device. Returns (z (h, nsegw, L) u16, bcode (h, nsegw) u8)."""
    import jax
    import jax.numpy as jnp

    h, w = shape
    wp = -(-w // L) * L

    def widths(arr):
        if wp != w:
            arr = jnp.pad(arr, ((0, 0), (0, wp - w)), mode="edge")
        prev = jnp.pad(arr, ((1, 0), (0, 0)))[:-1]
        mask = (jnp.arange(h) % G == 0)[:, None]
        prev = jnp.where(mask, 0, prev)
        d = (arr.astype(jnp.int32) - prev.astype(jnp.int32)) & 1023
        ds = ((d + 512) & 1023) - 512
        z = ((ds << 1) ^ (ds >> 31)).astype(jnp.uint16)
        zs = z.reshape(h, wp // L, L)
        zmax = zs.max(axis=2)
        b = jnp.zeros_like(zmax, dtype=jnp.uint8)
        b = jnp.where(zmax > 0, jnp.uint8(2), b)
        b = jnp.where(zmax > 3, jnp.uint8(5), b)
        b = jnp.where(zmax > 31, jnp.uint8(10), b)
        return zs, b

    return jax.jit(widths)


@lru_cache(maxsize=None)
def _devpack_fn(plan):
    """Jitted pass 2: gather segments into width buckets and pack
    each to words (inverse of the unpack layout)."""
    import jax
    import jax.numpy as jnp

    h, w, wp, n2, n5, n10 = plan
    sizes = {2: n2, 5: n5, 10: n10}

    def devpack(zs, gidx2, gidx5, gidx10):
        flat = zs.reshape(-1, L)
        out = []
        for bw, gidx in ((2, gidx2), (5, gidx5), (10, gidx10)):
            k = _slots(bw)
            nw = _words_per_seg(bw)
            seg = jnp.take(flat, gidx, axis=0).astype(jnp.uint32)
            seg = jnp.pad(seg, ((0, 0), (0, k * nw - L)))
            parts = seg.reshape(sizes[bw], k, nw)
            shifts = (jnp.arange(k, dtype=jnp.uint32) * bw)[None, :,
                                                            None]
            out.append((parts << shifts).sum(axis=1,
                                             dtype=jnp.uint32).ravel())
        # One fused buffer -> one d2h transfer (fixed per-transfer
        # overhead on the relay dwarfs the extra concat).
        return jnp.concatenate(out)

    return jax.jit(devpack)


def pack_plane_device(arr, fetch=np.asarray, max_bytes=None):
    """Pack a device-resident (H, W) u16 10-bit plane for readback.
    Pass 1 computes deltas + widths on device; the host fetches the
    tiny width map to build the bucket plan; pass 2 packs on device;
    the caller fetches the bucket words. Returns a PackedPlane of
    HOST numpy arrays (already fetched), or None when the estimated
    packed size exceeds max_bytes (caller falls back to a raw
    fetch)."""
    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h % G:
        raise ValueError(f"H={h} not a multiple of {G}")
    zs, bdev = _widths_fn((h, w))(arr)
    b = np.asarray(bdev)
    flat_b = b.ravel()
    if max_bytes is not None:
        est = sum(_pow2_pad(max(int((flat_b == bw).sum()), 1))
                  * _words_per_seg(bw) * 4 for bw in WIDTHS)
        if est > max_bytes:
            return None
    wp = -(-w // L) * L

    perm = np.zeros(flat_b.size, np.int32)
    gidx = {}
    base = 1
    for bw in WIDTHS:
        idx = np.nonzero(flat_b == bw)[0]
        n = idx.size
        npad = _pow2_pad(max(n, 1))
        gi = np.zeros(npad, np.int32)
        gi[:n] = idx
        # padding rows re-pack segment 0; the perm never points at
        # them, so their contents are irrelevant (but deterministic).
        gidx[bw] = gi
        perm[idx] = base + np.arange(n, dtype=np.int32)
        base += npad
    plan = (h, w, wp, gidx[2].size, gidx[5].size, gidx[10].size)
    blob = fetch(_devpack_fn(plan)(zs, gidx[2], gidx[5], gidx[10]))
    offs = _blob_offsets(plan)
    buckets = {bw: blob[offs[i]:offs[i + 1]].reshape(
        gidx[bw].size, _words_per_seg(bw))
        for i, bw in enumerate(WIDTHS)}
    return PackedPlane(plan, buckets, perm)


def unpack_plane_host(packed: PackedPlane) -> np.ndarray:
    """Pure-numpy inverse of pack_plane_device (host side of the
    readback path)."""
    h, w, wp, n2, n5, n10 = packed.plan
    nsegw = wp // L
    rows = [np.zeros((1, L), np.uint16)]
    for bw in WIDTHS:
        words = np.asarray(packed.buckets[bw])
        k = _slots(bw)
        mask = np.uint32((1 << bw) - 1)
        parts = [((words >> np.uint32(s * bw)) & mask).astype(np.uint16)
                 for s in range(k)]
        rows.append(np.concatenate(parts, axis=1)[:, :L])
    allrows = np.concatenate(rows, axis=0)
    z = allrows[packed.perm].reshape(h, wp).astype(np.int32)
    ds = (z >> 1) ^ -(z & 1)
    g = ds.reshape(h // G, G, wp)
    np.cumsum(g, axis=1, out=g)
    return (g.reshape(h, wp) & 1023).astype(np.uint16)[:, :w]


# ---------------------------------------------------------------------------
# RGBA1010102 batch readback: RCT + fine-width segment pack.
#
# The decoded-pixel readback is the headline's dominant link cost. The
# generic {0,2,5,10}/L=256 scheme above barely compresses decoded HDR
# output (JPEG ringing through the gain-map apply and OETF leaves
# few-code noise everywhere, and one >31 delta forces 10 bits on 256
# samples): measured 43.4 of 50 raw MB/frame on bench content. This
# path fixes both knobs, measured on a real decoded 4K frame:
#   - reversible channel decorrelation (G, R-G, B-G mod 1024) — the
#     three 10-bit channels are highly correlated (mean |zigzag delta|
#     31 -> 4.6 on the difference channels);
#   - L=64-sample segments with widths {1,2,3,4,5,6,8,10};
#   -> ~18 MB/frame, near this scheme's floor (order-0 delta entropy
#      is ~13 MB/frame).
# It also avoids the gather-index upload entirely (9.4 MB at L=64):
# pass 2 re-derives the bucket order on device with a deterministic
# stable sort of (width rank, segment index) keys and slices each
# bucket at a dynamic offset, so only a 9-word offsets vector crosses
# h2d. The host builds the identical perm from the width map it
# already fetched.
# ---------------------------------------------------------------------------

LF = 64                      # fine-pack samples per segment
FINE_WIDTHS = (1, 2, 3, 4, 5, 6, 8, 10)
_IDX_BITS = 22               # segment index field in the sort key


def _decor_planes_dev(x, n: int, h: int, w: int, wp: int, bits: int):
    """Traceable channel decorrelation shared by every readback
    preamble: RGBA1010102 u32 (bits=10) or RGBA-F16-halves u16x4
    (bits=16) -> (3*n*h, wp) i32 (G, R-G, B-G) planes mod 2^bits,
    wp-edge-padded. bits=8: x is an (n, 3*h, w) u8 composite of
    already-planar data (the decode intermediates readback); no
    cross-channel transform applies, so the "3 planes" are just the
    composite's thirds — an identity reshape that keeps every
    downstream row count (3*n*h) and the native unpack's phase
    geometry unchanged."""
    import jax.numpy as jnp

    mask = (1 << bits) - 1
    xi = x.astype(jnp.int32)
    if bits == 8:
        big = xi.reshape(3 * n * h, w)
    else:
        if bits == 10:
            r = xi & 1023
            g = (xi >> 10) & 1023
            b = (xi >> 20) & 1023
        else:
            r = xi[..., 0]
            g = xi[..., 1]
            b = xi[..., 2]
        big = jnp.concatenate([
            g.reshape(n * h, w), ((r - g) & mask).reshape(n * h, w),
            ((b - g) & mask).reshape(n * h, w)])
    if wp != w:
        big = jnp.pad(big, ((0, 0), (0, wp - w)), mode="edge")
    return big


def _zigzag_dev(d, bits: int):
    import jax.numpy as jnp

    mask = (1 << bits) - 1
    half = 1 << (bits - 1)
    ds = ((d + half) & mask) - half
    return ((ds << 1) ^ (ds >> 31)).astype(jnp.uint16)


def _vert_deltas_dev(big, rows: int, bits: int):
    """Vertical deltas mod 2^bits with per-G-group resets."""
    import jax.numpy as jnp

    prev = jnp.pad(big, ((1, 0), (0, 0)))[:-1]
    gmask = (jnp.arange(rows) % G == 0)[:, None]
    prev = jnp.where(gmask, 0, prev)
    return _zigzag_dev((big - prev) & ((1 << bits) - 1), bits)


def _med_deltas_dev(big, rows: int, bits: int):
    """MED/LOCO-I prediction residuals mod 2^bits. Boundaries zero
    the missing neighbors (group-start rows: up = upleft = 0; column
    0: left = upleft = 0) — with unsigned values the MED formula then
    degenerates to exactly the available neighbor, matching the
    native reconstruction (EmitMed in jpeg/native/packio.cpp)."""
    import jax.numpy as jnp

    left = jnp.pad(big, ((0, 0), (1, 0)))[:, :-1]
    up = jnp.pad(big, ((1, 0), (0, 0)))[:-1]
    ul = jnp.pad(big, ((1, 0), (1, 0)))[:-1, :-1]
    gmask = (jnp.arange(rows) % G == 0)[:, None]
    up = jnp.where(gmask, 0, up)
    ul = jnp.where(gmask, 0, ul)
    mx = jnp.maximum(left, up)
    mn = jnp.minimum(left, up)
    pred = jnp.where(ul >= mx, mn,
                     jnp.where(ul <= mn, mx, left + up - ul))
    return _zigzag_dev((big - pred) & ((1 << bits) - 1), bits)


def _rct_zigzag_deltas_dev(x, n: int, h: int, w: int, wp: int):
    """Traceable shared pass-1 preamble: (n, h, w) u32 RGBA1010102 ->
    (3*n*h, wp) u16 zigzag vertical deltas of the decorrelated
    (G, R-G, B-G) planes, wp-edge-padded, rows grouped by G."""
    rows = 3 * n * h
    return _vert_deltas_dev(_decor_planes_dev(x, n, h, w, wp, 10),
                            rows, 10)


def _rank_of_width():
    """width code -> bucket rank (0 for the all-zero class)."""
    return {0: 0, **{bw: i + 1 for i, bw in enumerate(FINE_WIDTHS)}}


@lru_cache(maxsize=None)
def _rct_widths_fn(shape):
    """Jitted pass 1 for an (n, h, w) u32 RGBA1010102 batch: RCT ->
    stacked (3nh, wp) plane -> zigzag vertical deltas -> per-LF-segment
    width codes. Returns (zs (rows, nsegw, LF) u16, bcode u8)."""
    import jax
    import jax.numpy as jnp

    n, h, w = shape
    wp = -(-w // LF) * LF
    rows = 3 * n * h

    def f(x):
        z = _rct_zigzag_deltas_dev(x, n, h, w, wp)
        zs = z.reshape(rows, wp // LF, LF)
        zmax = zs.max(axis=2).astype(jnp.int32)
        bc = jnp.zeros(zmax.shape, jnp.uint8)
        thr = 0
        for bw in FINE_WIDTHS:
            bc = jnp.where(zmax > thr, jnp.uint8(bw), bc)
            thr = (1 << bw) - 1
        return zs, bc

    return jax.jit(f)


@lru_cache(maxsize=None)
def _rct_devpack_fn(nseg_total: int, npads: tuple):
    """Jitted pass 2, keyed only on the (pow2-quantized) bucket
    paddings: stable-sort segments by (width rank, index), slice each
    width's run at its dynamic offset, gather + pack to words. Rows
    past a bucket's true count hold neighboring segments' data; the
    host perm never references them."""
    import jax
    import jax.numpy as jnp

    assert nseg_total < (1 << _IDX_BITS)
    maxpad = max(npads)

    def f(zs, bc, offs):
        flat = zs.reshape(-1, LF)
        rank = bc.reshape(-1).astype(jnp.int32)
        rank = rank - (rank > 6) - (rank > 8)   # widths 8,10 -> ranks 7,8
        key = (rank << _IDX_BITS) | jnp.arange(nseg_total,
                                               dtype=jnp.int32)
        sidx = jnp.sort(key) & ((1 << _IDX_BITS) - 1)
        # Static tail pad so dynamic_slice never clamps (which would
        # shift real rows out of a bucket's window).
        sidx = jnp.concatenate([sidx, jnp.zeros(maxpad, jnp.int32)])
        out = []
        for j, bw in enumerate(FINE_WIDTHS):
            npad = npads[j]
            idx = jax.lax.dynamic_slice(sidx, (offs[j],), (npad,))
            seg = jnp.take(flat, idx, axis=0).astype(jnp.uint32)
            k = 32 // bw
            nw = _wps(bw, LF)
            seg = jnp.pad(seg, ((0, 0), (0, k * nw - LF)))
            parts = seg.reshape(npad, k, nw)
            shifts = (jnp.arange(k, dtype=jnp.uint32) * bw)[None, :,
                                                            None]
            out.append((parts << shifts).sum(axis=1,
                                             dtype=jnp.uint32).ravel())
        return jnp.concatenate(out)

    return jax.jit(f)


def fetch_rgba1010102_batch(out_dev, fetch=np.asarray):
    """Fetch an (n, h, w) device RGBA1010102 batch via the RCT
    fine-width pack. Returns (host u32 (n, h, w), d2h_bytes), or
    (None, wasted_d2h_bytes) when the packed estimate exceeds ~85% of
    the raw size (caller falls back to a raw fetch; the width map that
    already crossed the link still counts toward its accounting).
    Alpha is re-attached as the packer's constant 0xC0000000."""
    n, h, w = (int(s) for s in out_dev.shape)
    zs, bdev = _rct_widths_fn((n, h, w))(out_dev)
    bmap = np.asarray(bdev)                      # (rows, nsegw) u8
    flat_b = bmap.ravel()
    nseg_total = flat_b.size
    if nseg_total >= (1 << _IDX_BITS):
        return None, bmap.nbytes
    rank_lut = np.zeros(11, np.intp)
    for bwv, rk in _rank_of_width().items():
        rank_lut[bwv] = rk
    counts = np.bincount(rank_lut[flat_b],
                         minlength=len(FINE_WIDTHS) + 1)
    # Floor 32 (not 256): 8 fine buckets at the generic floor would
    # dwarf small images outright; pow2 quantization still bounds the
    # compiled-variant count.
    npads = tuple(_pow2_pad(max(int(counts[j + 1]), 1), floor=32)
                  for j in range(len(FINE_WIDTHS)))
    est = sum(npads[j] * _wps(bw, LF) * 4
              for j, bw in enumerate(FINE_WIDTHS)) + nseg_total
    if est > 0.85 * n * h * w * 4:
        return None, bmap.nbytes
    # Bucket start offsets in the sorted order (zeros class first).
    offs = np.zeros(len(FINE_WIDTHS), np.int32)
    acc = int(counts[0])
    for j in range(len(FINE_WIDTHS)):
        offs[j] = acc
        acc += int(counts[j + 1])
    blob = fetch(_rct_devpack_fn(nseg_total, npads)(zs, bdev, offs))
    d2h_bytes = blob.nbytes + bmap.nbytes
    out = _host_unpack_rct(blob, bmap, counts, npads, n, h, w)
    return out, d2h_bytes


# ---------------------------------------------------------------------------
# Rice-coded readback: RCT + per-256-sample-segment Rice(k).
#
# The fine-width scheme above spends max-of-64 bits on every sample of
# a segment; Rice coding adapts to the MEAN instead (measured on
# decoded bench content: 3.66 -> 2.62 bits/sample, ~29% fewer readback
# bytes). Each zigzag delta z is coded as q = z >> k unary (q zero
# bits then a one, LSB-first in u32 words) plus k low bits. The two
# component streams keep fixed per-segment shapes the TPU packs
# without any per-sample variable-length assembly:
#   - remainders: the existing k-bit slot layout (k = 0..9 buckets);
#   - unary: a per-segment BITMAP of the terminator positions
#     (sum(q) + 256 bits), grouped into word-count classes.
# Per-segment k is chosen on device by evaluating all ten candidate
# costs; k is constrained so the unary part fits _RICE_UCAP words
# (k = 9 always fits: q <= 1). All-zero segments store nothing
# (k code 15). The host fetches a 2-byte/segment map, builds the
# bucket plan, and the device's pass 2 re-derives the identical order
# with a (rank, index) key sort, like the fine-width path above.
# ---------------------------------------------------------------------------

RL = 256                     # Rice samples per segment
_RICE_KS = tuple(range(10))  # remainder widths
_RICE_UCAP = 24              # unary words cap per segment (768 bits)
_RICE_UCLS = (8, 10, 12, 14, 16, 20, 24)   # unary word classes
_RICE_ZERO = 15              # k-code sentinel: all-zero segment


def _uclass_of(uw: int) -> int:
    for c, lim in enumerate(_RICE_UCLS):
        if uw <= lim:
            return c
    raise AssertionError(f"unary words {uw} above cap")


def _rice_seg_stats(zs, ks, zero_code):
    """Traceable per-segment Rice plan: optimal k (by total bits,
    subject to the unary word cap) and unary word count for each
    (nseg, RL) u16 segment. Returns the stacked (2, nseg) u8 map
    [kcode, uw]; all-zero segments get kcode = zero_code, uw = 0."""
    import jax.numpy as jnp

    zi = zs.astype(jnp.int32)
    zero = jnp.all(zi == 0, axis=1)
    best_bits = jnp.full(zs.shape[0], 2**30, jnp.int32)
    best_k = jnp.zeros(zs.shape[0], jnp.int32)
    best_uw = jnp.zeros(zs.shape[0], jnp.int32)
    for k in ks:
        sq = jnp.sum(zi >> k, axis=1)
        uwk = (sq + RL + 31) >> 5
        bits = sq + RL * (1 + k)
        ok = uwk <= _RICE_UCAP
        better = ok & (bits < best_bits)
        best_bits = jnp.where(better, bits, best_bits)
        best_k = jnp.where(better, k, best_k)
        best_uw = jnp.where(better, uwk, best_uw)
    kcode = jnp.where(zero, zero_code, best_k).astype(jnp.uint8)
    uw = jnp.where(zero, 0, best_uw).astype(jnp.uint8)
    # One stacked map -> ONE d2h fetch for both planes.
    return jnp.stack([kcode, uw])


@lru_cache(maxsize=None)
def _pass1_widths_fn(shape, bits: int, med: bool):
    """Jitted pass 1 shared by all Rice readback variants: channel
    decorrelation -> vertical-delta or MED residuals -> per-RL-segment
    optimal k and unary word count. Returns (zs (nseg, RL) u16,
    stacked (2, nseg) u8 [kcode, uw]) — all device-resident."""
    import jax

    n, h, w = shape
    wp = -(-w // RL) * RL
    rows = 3 * n * h
    kset = _RICE16_KS if bits == 16 else _RICE_KS
    zero = _RICE16_ZERO if bits == 16 else _RICE_ZERO
    residuals = _med_deltas_dev if med else _vert_deltas_dev

    def f(x):
        big = _decor_planes_dev(x, n, h, w, wp, bits)
        z = residuals(big, rows, bits)
        zs = z.reshape(rows * (wp // RL), RL)
        return zs, _rice_seg_stats(zs, kset, zero)

    return jax.jit(f)


def _rice_widths_fn(shape):
    return _pass1_widths_fn(shape, 10, False)


@lru_cache(maxsize=None)
def _pass1_both_fn(shape, bits: int):
    """Jitted pass 1 computing BOTH residual schemes in one dispatch
    (shared decorrelation): returns (zs_vert, zs_med, (4, nseg) u8
    stacked [kcode_v, uw_v, kcode_m, uw_m]) so the host can pick the
    scheme with the smaller exact packed-size estimate per batch —
    MED usually wins on natural content, vertical on tiny images
    where bucket pow2-padding dominates."""
    import jax
    import jax.numpy as jnp

    n, h, w = shape
    wp = -(-w // RL) * RL
    rows = 3 * n * h
    kset = _RICE16_KS if bits == 16 else _RICE_KS
    zero = _RICE16_ZERO if bits == 16 else _RICE_ZERO

    def f(x):
        big = _decor_planes_dev(x, n, h, w, wp, bits)
        zv = _vert_deltas_dev(big, rows, bits) \
            .reshape(rows * (wp // RL), RL)
        zm = _med_deltas_dev(big, rows, bits) \
            .reshape(rows * (wp // RL), RL)
        return zv, zm, jnp.concatenate([
            _rice_seg_stats(zv, kset, zero),
            _rice_seg_stats(zm, kset, zero)])

    return jax.jit(f)


def _cumsum_lanes_i32(x):
    """Inclusive cumsum along the last (lane) axis via log-doubling
    pad-shift-add — jnp.cumsum on the lane dim lowers to an O(n^2)
    reduce_window on TPU."""
    import jax.numpy as jnp

    n = x.shape[-1]
    s = 1
    while s < n:
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
        s <<= 1
    return x


def _rice_pack_body(zs, kuw, offs, *, nseg_total: int,
                    rem_npads: tuple, un_npads: tuple, kset: tuple,
                    zero_code: int):
    """Traceable Rice pack: stable-sort segments by (k rank, index) and
    by (unary class rank, index), then pack each remainder bucket in
    the k-bit slot layout and each unary bucket as terminator-position
    bitmaps. Rows past a bucket's true count hold other segments'
    data; the host never reads them. Parametric over the k-width set
    (0..9 for 10-bit RCT samples, 0..15 for the F16 variant). Shared
    verbatim by the two-phase pass 2 (_rice_devpack_fn) and the fused
    single-fetch kernel (_fused_fetch_fn) so their blobs are
    bit-identical and one host unpack serves both."""
    import jax
    import jax.numpy as jnp

    assert nseg_total < (1 << _IDX_BITS)
    maxpad = max(max(rem_npads), max(un_npads))
    ncls = len(_RICE_UCLS)
    ucls_arr = np.asarray(_RICE_UCLS, np.int32)
    kmax = max(kset)

    flat = zs.astype(jnp.int32)
    kc = kuw[0].astype(jnp.int32)
    uw = kuw[1]
    rem_offs = offs[:len(kset)]
    un_offs = offs[len(kset):]
    idxv = jnp.arange(nseg_total, dtype=jnp.int32)

    # Remainder order: rank = k (zero segments sort last).
    rrank = jnp.where(kc == zero_code, len(kset), kc)
    rkey = (rrank << _IDX_BITS) | idxv
    sidx_rem = jnp.sort(rkey) & ((1 << _IDX_BITS) - 1)
    sidx_rem = jnp.concatenate([sidx_rem,
                                jnp.zeros(maxpad, jnp.int32)])

    # Unary order: rank = word-count class (zero segments last).
    uws = uw.astype(jnp.int32)
    urank = jnp.searchsorted(jnp.asarray(ucls_arr), uws)
    urank = jnp.where(kc == zero_code, ncls, urank)
    ukey = (urank << _IDX_BITS) | idxv
    sidx_un = jnp.sort(ukey) & ((1 << _IDX_BITS) - 1)
    sidx_un = jnp.concatenate([sidx_un,
                               jnp.zeros(maxpad, jnp.int32)])

    # Unary terminator positions (shared by every class bucket):
    # pos_i = cumsum(q + 1) - 1, strictly increasing, < 32*UCAP.
    q = flat >> jnp.minimum(kc, kmax)[:, None]
    pos = _cumsum_lanes_i32(q + 1) - 1

    out = []
    for j, k in enumerate(kset):
        npad = rem_npads[j]
        if k == 0:
            continue                  # no remainder bits
        idx = jax.lax.dynamic_slice(sidx_rem, (rem_offs[j],),
                                    (npad,))
        seg = jnp.take(flat, idx, axis=0).astype(jnp.uint32) \
            & jnp.uint32((1 << k) - 1)
        ks = 32 // k
        nw = _wps(k, RL)
        seg = jnp.pad(seg, ((0, 0), (0, ks * nw - RL)))
        parts = seg.reshape(npad, ks, nw)
        shifts = (jnp.arange(ks, dtype=jnp.uint32) * k)[None, :,
                                                        None]
        out.append((parts << shifts).sum(axis=1,
                                         dtype=jnp.uint32).ravel())
    for c in range(ncls):
        npad = un_npads[c]
        wc = _RICE_UCLS[c]
        idx = jax.lax.dynamic_slice(sidx_un, (un_offs[c],), (npad,))
        p = jnp.take(pos, idx, axis=0)
        pw = p >> 5
        pb = (jnp.uint32(1) << (p & 31).astype(jnp.uint32))
        words = []
        for wi in range(wc):
            words.append(jnp.sum(
                jnp.where(pw == wi, pb, jnp.uint32(0)), axis=1,
                dtype=jnp.uint32))
        out.append(jnp.stack(words, axis=1).ravel())
    return jnp.concatenate(out)



@lru_cache(maxsize=None)
def _rice_devpack_fn(nseg_total: int, rem_npads: tuple, un_npads: tuple,
                     kset: tuple = _RICE_KS,
                     zero_code: int = _RICE_ZERO):
    """Jitted Rice pass 2 of the two-phase fetch: the shared pack body
    over host-planned bucket paddings (see _rice_pack_body)."""
    import jax

    def f(zs, kuw, offs):
        return _rice_pack_body(zs, kuw, offs, nseg_total=nseg_total,
                               rem_npads=rem_npads, un_npads=un_npads,
                               kset=kset, zero_code=zero_code)

    return jax.jit(f)


# ---------------------------------------------------------------------------
# Fused single-fetch Rice readback.
#
# The two-phase fetch costs two full host<->device round trips per
# batch (pass-1 dispatch -> map d2h -> host plan -> pass-2 dispatch ->
# blob d2h); each round trip carries 30-150 ms of fixed latency on the
# relay link, and in a steady-state serving loop the content statistics
# barely move between batches. This path speculates the bucket plan:
# it reuses the previous batch's pow2-padded bucket sizes (static
# shapes for XLA), derives the bucket ORDER on device (bincount +
# cumsum of the current batch's width codes), packs with the shared
# _rice_pack_body, and appends [fit flag, scheme, counts, per-segment
# kuw map] to the SAME u32 buffer — so one dispatch and ONE d2h fetch
# complete the whole readback. If the current counts overflow the
# speculated paddings (content shift), the fit flag comes back 0 and
# the caller repacks via the exact two-phase path and widens the
# cached plan. Disable with UHDR_FUSED_FETCH=0.
# ---------------------------------------------------------------------------

#: (shape, bits) -> {"uses": int, "plans": {med_bool: plan | None}}
#: where plan = {"rem_npads", "un_npads", "est"} and None marks a
#: scheme planned-and-found-incompressible. The auto two-phase pass
#: seeds BOTH schemes (its dual pass 1 plans both anyway), so the
#: fused single-roundtrip path can re-pick the scheme per batch from
#: the cost model instead of pinning whatever the seeding batch chose.
#: Process-wide like the _BPS EWMAs.
_PLAN_CACHE: dict = {}

#: Re-run the exact dual-scheme two-phase plan every N fused fetches
#: so a slow content drift can still flip the MED/vert pick and shrink
#: over-wide paddings.
_PLAN_REFRESH = 64


def _fused_head_len(kset) -> int:
    return 2 + (len(kset) + 1) + (len(_RICE_UCLS) + 1)


def _fused_blob_words(rem_npads, un_npads, kset) -> int:
    return (sum(rem_npads[j] * _wps(k, RL)
                for j, k in enumerate(kset) if k)
            + sum(un_npads[c] * _RICE_UCLS[c]
                  for c in range(len(_RICE_UCLS))))


@lru_cache(maxsize=None)
def _fused_fetch_fn(shape, bits: int, med: bool, rem_npads: tuple,
                    un_npads: tuple):
    """Jitted fused readback: residuals -> per-segment Rice stats ->
    device-side bucket plan (counts/offsets) -> shared pack body ->
    one u32 buffer [blob | fit,scheme,counts | kuw bytes]."""
    import jax
    import jax.numpy as jnp

    n, h, w = shape
    wp = -(-w // RL) * RL
    rows = 3 * n * h
    kset = _RICE16_KS if bits == 16 else _RICE_KS
    zero = _RICE16_ZERO if bits == 16 else _RICE_ZERO
    ncls = len(_RICE_UCLS)
    nseg_total = rows * (wp // RL)
    residuals = _med_deltas_dev if med else _vert_deltas_dev
    ucls_arr = np.asarray(_RICE_UCLS, np.int32)

    def f(x):
        big = _decor_planes_dev(x, n, h, w, wp, bits)
        z = residuals(big, rows, bits)
        zs = z.reshape(nseg_total, RL)
        kuw = _rice_seg_stats(zs, kset, zero)
        kc = kuw[0].astype(jnp.int32)
        uwv = kuw[1].astype(jnp.int32)
        nonzero = kc != zero
        rem_counts = jnp.bincount(
            jnp.where(nonzero, kc, len(kset)), length=len(kset) + 1)
        ucls = jnp.searchsorted(jnp.asarray(ucls_arr), uwv)
        un_counts = jnp.bincount(
            jnp.where(nonzero, ucls, ncls), length=ncls + 1)
        fit = (jnp.all(rem_counts[:len(kset)]
                       <= jnp.asarray(rem_npads, rem_counts.dtype))
               & jnp.all(un_counts[:ncls]
                         <= jnp.asarray(un_npads, un_counts.dtype)))
        zero32 = jnp.zeros(1, jnp.int32)
        rem_offs = jnp.concatenate([zero32, jnp.cumsum(
            rem_counts[:len(kset) - 1].astype(jnp.int32))])
        un_offs = jnp.concatenate([zero32, jnp.cumsum(
            un_counts[:ncls - 1].astype(jnp.int32))])
        offs = jnp.concatenate([rem_offs, un_offs])
        blob = _rice_pack_body(zs, kuw, offs, nseg_total=nseg_total,
                               rem_npads=rem_npads, un_npads=un_npads,
                               kset=kset, zero_code=zero)
        head = jnp.concatenate([
            fit.astype(jnp.uint32).reshape(1),
            jnp.full(1, 1 if med else 0, jnp.uint32),
            rem_counts.astype(jnp.uint32),
            un_counts.astype(jnp.uint32)])
        kuw_flat = kuw.reshape(-1)
        padk = (-kuw_flat.shape[0]) % 4
        if padk:
            kuw_flat = jnp.concatenate(
                [kuw_flat, jnp.zeros(padk, jnp.uint8)])
        # LE byte packing both ways on this platform (same contract as
        # sharding's fused h2d rows: host .view, device bitcast).
        kuw_words = jax.lax.bitcast_convert_type(
            kuw_flat.reshape(-1, 4), jnp.uint32)
        return jnp.concatenate([blob, head, kuw_words])

    return jax.jit(f)


def _try_fused_fetch(out_dev, fetch, *, n, h, w, bits, ent, sel,
                     stages, raw_bytes, kset, zero, native_fn_med,
                     native_fn_vert, tails, out_shape, out_dtype):
    """Fused-path driver. Returns (out, d2h_bytes) on success,
    (None, wasted_bytes) for incompressible content, or the sentinel
    string "two_phase" when the caller should fall through to the
    exact two-phase path (periodic plan refresh)."""
    ent["uses"] += 1
    if ent["uses"] % _PLAN_REFRESH == 0:
        return "two_phase"
    med = sel
    pl = ent["plans"][sel]
    rem_npads, un_npads = pl["rem_npads"], pl["un_npads"]
    wp = -(-w // RL) * RL
    nseg_total = 3 * n * h * (wp // RL)
    blob_words = _fused_blob_words(rem_npads, un_npads, kset)
    head_len = _fused_head_len(kset)

    t0 = time.perf_counter()
    dev = _fused_fetch_fn((n, h, w), bits, med, rem_npads,
                          un_npads)(out_dev)
    t1 = time.perf_counter()
    if os.environ.get("UHDR_FETCH_SYNC_STAGES") == "1":
        dev.block_until_ready()
        stages["fused_compute"] = round(
            (time.perf_counter() - t1) * 1e3, 1)
        stages["roundtrips"] += 1
    combined = np.ascontiguousarray(fetch(dev))
    t2 = time.perf_counter()
    stages["pass1_dispatch"] = round((t1 - t0) * 1e3, 1)
    stages["fused_fetch"] = round((t2 - t1) * 1e3, 1)
    stages["blob_MBps"] = round(
        combined.nbytes / 2**20 / max(t2 - t1, 1e-9), 1)
    stages["roundtrips"] += 1
    stages["mode"] = "fused"
    _bps_update("d2h_link", combined.nbytes, t2 - t1)

    head = combined[blob_words:blob_words + head_len]
    fit = bool(head[0])
    rem_counts = head[2:2 + len(kset) + 1].astype(np.int64)
    un_counts = head[2 + len(kset) + 1:head_len].astype(np.int64)
    kuw_bytes = combined[blob_words + head_len:].view(np.uint8)
    kmap = kuw_bytes[:nseg_total]
    uwmap = kuw_bytes[nseg_total:2 * nseg_total]
    native_fn = native_fn_med if med else native_fn_vert
    tail = tails[0 if med else 1]

    if fit:
        tu = time.perf_counter()
        out = _host_unpack_rice_core(
            combined[:blob_words], kmap, uwmap, rem_counts, un_counts,
            rem_npads, un_npads, n, h, w, kset=kset, zero_code=zero,
            native_fn=native_fn, out_shape=out_shape,
            out_dtype=out_dtype, tail=tail)
        stages["unpack"] = round((time.perf_counter() - tu) * 1e3, 1)
        stages["scheme"] = "med" if med else "vert"
        global LAST_PICK
        LAST_PICK = stages["scheme"]
        return out, combined.nbytes

    # Speculation miss: the content shifted past the cached paddings.
    # Rebuild the exact plan from the map we already fetched, redo
    # pass 1 + 2 (one extra dispatch + one extra fetch), and widen the
    # cached plan so the next batch fits again.
    from ..utils import counters

    counters.bump("fused_fetch_replan")
    plan = _rice_host_plan(kmap, uwmap, kset, zero, raw_bytes)
    if plan is None:        # turned incompressible: raw fetch wins
        ent["plans"][sel] = None
        if all(v is None for v in ent["plans"].values()):
            _PLAN_CACHE.pop(((n, h, w), bits), None)
        return None, combined.nbytes
    rem_counts, un_counts, rem_npads2, un_npads2, offs, est2 = plan
    zs, kuw_dev = _pass1_widths_fn((n, h, w), bits, med)(out_dev)
    blob = fetch(_rice_devpack_fn(nseg_total, rem_npads2, un_npads2,
                                  kset, zero)(zs, kuw_dev, offs))
    stages["roundtrips"] += 1
    stages["replan"] = 1
    out = _host_unpack_rice_core(
        blob, kmap, uwmap, rem_counts, un_counts, rem_npads2,
        un_npads2, n, h, w, kset=kset, zero_code=zero,
        native_fn=native_fn, out_shape=out_shape, out_dtype=out_dtype,
        tail=tail)
    new_rem = tuple(max(a, b) for a, b in zip(rem_npads, rem_npads2))
    new_un = tuple(max(a, b) for a, b in zip(un_npads, un_npads2))
    widened = (_fused_blob_words(new_rem, new_un, kset) * 4
               + 2 * nseg_total)
    if widened <= 0.85 * raw_bytes:
        ent["plans"][sel] = {"rem_npads": new_rem, "un_npads": new_un,
                             "est": est2}
    else:
        ent["plans"][sel] = None
        if all(v is None for v in ent["plans"].values()):
            _PLAN_CACHE.pop(((n, h, w), bits), None)
    LAST_PICK = "med" if med else "vert"
    return out, combined.nbytes + blob.nbytes


def _rice_host_plan(kmap, uwmap, kset, zero_code, raw_bytes):
    """Shared host half of the Rice plan: bucket counts, pow2-padded
    sizes, device slice offsets and the packed-size estimate. Returns
    None when the content is incompressible (caller falls back)."""
    nonzero = kmap != zero_code
    rem_counts = np.bincount(np.where(nonzero, kmap, len(kset)),
                             minlength=len(kset) + 1)
    ucls_lim = np.asarray(_RICE_UCLS, np.int64)
    ucls = np.searchsorted(ucls_lim, uwmap.astype(np.int64))
    un_counts = np.bincount(np.where(nonzero, ucls, len(_RICE_UCLS)),
                            minlength=len(_RICE_UCLS) + 1)

    rem_npads = tuple(_pow2_pad(max(int(rem_counts[j]), 1), floor=32)
                      for j in range(len(kset)))
    un_npads = tuple(_pow2_pad(max(int(un_counts[c]), 1), floor=32)
                     for c in range(len(_RICE_UCLS)))
    est = (sum(rem_npads[j] * _wps(k, RL) * 4
               for j, k in enumerate(kset) if k)
           + sum(un_npads[c] * _RICE_UCLS[c] * 4
                 for c in range(len(_RICE_UCLS)))
           + kmap.nbytes + uwmap.nbytes)
    if est > 0.85 * raw_bytes:
        return None

    rem_offs = np.zeros(len(kset), np.int32)
    acc = 0
    for j in range(len(kset)):
        rem_offs[j] = acc
        acc += int(rem_counts[j])
    un_offs = np.zeros(len(_RICE_UCLS), np.int32)
    acc = 0
    for c in range(len(_RICE_UCLS)):
        un_offs[c] = acc
        acc += int(un_counts[c])
    return (rem_counts, un_counts, rem_npads, un_npads,
            np.concatenate([rem_offs, un_offs]), est)


# Observed-throughput EWMAs feeding the cost-aware scheme pick
# (bytes/second): "d2h_link" from the blob fetches, and per-native-fn
# host unpack speed in RAW OUTPUT bytes/s. Process-wide. IMPORTANT:
# unpack throughput is strongly size-dependent — cache-resident
# microbench shapes measure several hundred MB/s, but at production
# 4K-batch sizes this 1-core host sustains ~20-45 MB/s for MED's
# strictly-sequential LOCO-I reconstruction vs much higher for the
# vertical scheme (tools/bench_unpack.py measures it) — so the pick
# must use EWMAs observed at the serving shape, and _auto_pick_scheme
# explores the not-yet-measured scheme once before trusting the model.
_BPS: dict = {}


def _bps_update(key, nbytes, secs, alpha=0.3):
    if secs <= 0 or nbytes <= 0:
        return
    bps = nbytes / secs
    old = _BPS.get(key)
    _BPS[key] = bps if old is None else old + alpha * (bps - old)


#: Last auto-pick decision ("med" | "vert"), for stats/debugging.
LAST_PICK = None

#: Per-stage timing of the most recent Rice fetch (ms) — the
#: observability VERDICT r4 asked for: without it, a slow fetch stage
#: is unattributable between link weather, device pack compute, host
#: plan work and the native unpack. Keys: pass1_dispatch, map_fetch,
#: plan, pass2_blob (one number unless UHDR_FETCH_SYNC_STAGES=1 splits
#: it into pass2_sync + blob_fetch at the cost of one extra device
#: sync), unpack, total; plus roundtrips (host<->device transfer
#: count) and blob_MBps (effective link speed of the big fetch).
LAST_FETCH_STAGES: dict = {}


def _auto_pick_scheme(plan_v, plan_m, raw_bytes, vert_fn, med_fn):
    """True = pack MED, False = vertical. Once both the link and each
    scheme's unpack throughput have been observed, pick the smaller
    estimated fetch-stage time (wire bytes / link + raw bytes /
    unpack). While exactly one scheme's unpack speed is still
    unobserved, pick THAT scheme (one exploration batch — without it a
    cold-start bytes-only pick pins the slow-unpack scheme forever via
    the fused plan cache, which is exactly how round 4's on-chip run
    spent 6.5 s/batch in the MED host unpack). Before anything is
    measured — or when only one plan is viable — pick the fewer
    planned wire bytes. UHDR_READBACK_SCHEME=med|vert is handled by
    the caller (it skips the dual pass-1 entirely)."""
    if plan_m is None:
        return False
    if plan_v is None:
        return True
    uv = _BPS.get(vert_fn)
    um = _BPS.get(med_fn)
    if um is None and uv is not None:
        return True
    if uv is None and um is not None:
        return False
    link = _BPS.get("d2h_link")
    if link and uv and um:
        return (plan_m[-1] / link + raw_bytes / um
                <= plan_v[-1] / link + raw_bytes / uv)
    return plan_m[-1] <= plan_v[-1]


def _fetch_rice_core(out_dev, fetch, *, bits, med):
    """Shared fetch driver for the Rice readback variants
    ({10-bit RGBA1010102, F16 halves} x {vertical, MED, auto}): pass 1
    widths on device, host plan, pass 2 pack on device, host unpack
    (native MT / numpy). med="auto" computes both schemes' stats in
    one dispatch and packs whichever plans fewer bytes (requires the
    native MED unpacker — its numpy fallback is a per-pixel loop).
    Returns (host array, d2h_bytes) or (None, wasted_bytes)."""
    stages = {"roundtrips": 0}
    global LAST_FETCH_STAGES
    LAST_FETCH_STAGES = stages
    t_start = time.perf_counter()
    shape = tuple(int(v) for v in out_dev.shape)
    if bits == 16:
        if len(shape) != 4 or shape[-1] != 4:
            return None, 0
        n, h, w = shape[:3]
        raw_bytes = n * h * w * 8
        kset, zero = _RICE16_KS, _RICE16_ZERO
        out_shape, out_dtype = (n, h, w, 4), np.uint16
    elif bits == 8:
        # Planar u8 composite (n, 3*h, w): the "channels" are the
        # composite's thirds (see _decor_planes_dev), so h here is a
        # third of the real row count.
        if len(shape) != 3 or shape[1] % 3:
            return None, 0
        n, h3, w = shape
        h = h3 // 3
        raw_bytes = n * h3 * w
        kset, zero = _RICE_KS, _RICE_ZERO
        out_shape, out_dtype = (n, h3, w), np.uint8
    else:
        n, h, w = shape
        raw_bytes = n * h * w * 4
        kset, zero = _RICE_KS, _RICE_ZERO
        out_shape, out_dtype = (n, h, w), np.uint32

    if med == "auto":
        from ..jpeg import native

        lib = native.get_lib()
        med_fn = _MED_FN_BY_BITS[bits]
        if lib is None or getattr(lib, med_fn, None) is None:
            med = False
        else:
            env = os.environ.get("UHDR_READBACK_SCHEME")
            if env in ("med", "vert"):   # forced: skip the dual pass-1
                med = env == "med"
    # Fused single-fetch path: once a batch of this shape has been
    # packed, its bucket plan is cached and the next batch completes
    # in ONE dispatch + ONE d2h fetch (plan speculated, validated by
    # the fit flag in the fetched tail).
    if os.environ.get("UHDR_FUSED_FETCH", "1") != "0":
        ent = _PLAN_CACHE.get(((n, h, w), bits))
        sel = None
        if ent is not None:
            med_fn2 = _MED_FN_BY_BITS[bits]
            vert_fn2 = _VERT_FN_BY_BITS[bits]
            plans = ent["plans"]
            if med == "auto":
                # Auto needs both schemes planned (the dual pass 1
                # seeds both); re-pick per batch from the cost model.
                if True in plans and False in plans:
                    pm, pv = plans[True], plans[False]
                    if pm is None:
                        sel = False if pv is not None else None
                    elif pv is None:
                        sel = True
                    else:
                        um = _BPS.get(med_fn2)
                        uv = _BPS.get(vert_fn2)
                        if (um is None) != (uv is None):
                            # One scheme's unpack speed unobserved at
                            # this shape: explore it via the two-phase
                            # path instead of pinning the other.
                            sel = None
                        else:
                            link = _BPS.get("d2h_link")
                            if link and um and uv:
                                sel = (pm["est"] / link
                                       + raw_bytes / um
                                       <= pv["est"] / link
                                       + raw_bytes / uv)
                            else:
                                sel = pm["est"] <= pv["est"]
            elif plans.get(med) is not None:
                sel = med
        if sel is not None:
            tails = (_MED_TAIL_BY_BITS[bits], _VERT_TAIL_BY_BITS[bits])
            try:
                res = _try_fused_fetch(
                    out_dev, fetch, n=n, h=h, w=w, bits=bits, ent=ent,
                    sel=sel, stages=stages, raw_bytes=raw_bytes,
                    kset=kset, zero=zero, native_fn_med=med_fn2,
                    native_fn_vert=vert_fn2, tails=tails,
                    out_shape=out_shape, out_dtype=out_dtype)
            except Exception:
                from ..utils import counters
                from ..utils.log import get_logger

                counters.bump("fused_fetch_fallback")
                get_logger().warning(
                    "fused rice fetch failed; two-phase fallback",
                    exc_info=True)
                _PLAN_CACHE.pop(((n, h, w), bits), None)
                res = "two_phase"
            if res != "two_phase":
                if res[0] is not None:
                    stages["total"] = round(
                        (time.perf_counter() - t_start) * 1e3, 1)
                return res

    if med == "auto":
        t0 = time.perf_counter()
        zs_v, zs_m, kuw4 = _pass1_both_fn((n, h, w), bits)(out_dev)
        t1 = time.perf_counter()
        maps4 = np.asarray(kuw4)
        t2 = time.perf_counter()
        stages["pass1_dispatch"] = round((t1 - t0) * 1e3, 1)
        stages["map_fetch"] = round((t2 - t1) * 1e3, 1)
        stages["roundtrips"] += 1
        nseg_total = maps4.shape[1]
        if nseg_total >= (1 << _IDX_BITS):
            return None, maps4.nbytes
        plan_v = _rice_host_plan(maps4[0], maps4[1], kset, zero,
                                 raw_bytes)
        plan_m = _rice_host_plan(maps4[2], maps4[3], kset, zero,
                                 raw_bytes)
        if plan_v is None and plan_m is None:
            return None, maps4.nbytes
        vert_fn = _VERT_FN_BY_BITS[bits]
        use_med = _auto_pick_scheme(plan_v, plan_m, raw_bytes,
                                    vert_fn, med_fn)
        med = bool(use_med)
        zs = zs_m if use_med else zs_v
        kmap, uwmap = (maps4[2], maps4[3]) if use_med \
            else (maps4[0], maps4[1])
        kuw_dev = kuw4[2:4] if use_med else kuw4[0:2]
        plan = plan_m if use_med else plan_v
        seed_plans = {True: plan_m, False: plan_v}
        maps_nbytes = maps4.nbytes
    else:
        t0 = time.perf_counter()
        zs, kuw_dev = _pass1_widths_fn((n, h, w), bits, med)(out_dev)
        t1 = time.perf_counter()
        maps = np.asarray(kuw_dev)
        t2 = time.perf_counter()
        stages["pass1_dispatch"] = round((t1 - t0) * 1e3, 1)
        stages["map_fetch"] = round((t2 - t1) * 1e3, 1)
        stages["roundtrips"] += 1
        kmap, uwmap = maps[0], maps[1]
        nseg_total = kmap.size
        if nseg_total >= (1 << _IDX_BITS):
            return None, maps.nbytes
        plan = _rice_host_plan(kmap, uwmap, kset, zero, raw_bytes)
        if plan is None:
            return None, maps.nbytes
        seed_plans = {med: plan}
        maps_nbytes = maps.nbytes
    global LAST_PICK
    LAST_PICK = "med" if med else "vert"
    rem_counts, un_counts, rem_npads, un_npads, offs, _est = plan
    if med:
        native_fn = _MED_FN_BY_BITS[bits]
        tail = _MED_TAIL_BY_BITS[bits]
    else:
        native_fn = _VERT_FN_BY_BITS[bits]
        tail = _VERT_TAIL_BY_BITS[bits]

    blob_bytes = 0
    try:
        t0 = time.perf_counter()
        stages["plan"] = round((t0 - t2) * 1e3, 1)
        blob_dev = _rice_devpack_fn(nseg_total, rem_npads, un_npads,
                                    kset, zero)(zs, kuw_dev, offs)
        if os.environ.get("UHDR_FETCH_SYNC_STAGES") == "1":
            # Opt-in split of pass-2 device time vs the blob transfer
            # (adds one device sync / link round trip, so it is a
            # diagnostic mode, not the production path).
            blob_dev.block_until_ready()
            ts = time.perf_counter()
            stages["pass2_sync"] = round((ts - t0) * 1e3, 1)
            stages["roundtrips"] += 1
        blob = fetch(blob_dev)
        tf = time.perf_counter()
        blob_bytes = blob.nbytes
        stages["pass2_blob"] = round((tf - t0) * 1e3, 1)
        if "pass2_sync" in stages:
            stages["blob_fetch"] = round(
                stages["pass2_blob"] - stages["pass2_sync"], 1)
        stages["roundtrips"] += 1
        stages["blob_MBps"] = round(
            blob_bytes / 2**20 / max(tf - t0, 1e-9), 1)
        # Link-speed sample for the cost-aware pick (includes the
        # pass-2 device time, so it under-estimates the link — which
        # only biases the pick toward fewer wire bytes).
        _bps_update("d2h_link", blob_bytes, tf - t0)
        tu = time.perf_counter()
        out = _host_unpack_rice_core(
            blob, kmap, uwmap, rem_counts, un_counts, rem_npads,
            un_npads, n, h, w, kset=kset, zero_code=zero,
            native_fn=native_fn, out_shape=out_shape,
            out_dtype=out_dtype, tail=tail)
        tend = time.perf_counter()
        stages["unpack"] = round((tend - tu) * 1e3, 1)
        stages["total"] = round((tend - t_start) * 1e3, 1)
        stages["scheme"] = "med" if med else "vert"
        # Seed/refresh the fused path's speculated plans for the next
        # batch of this shape (carry the use counter so the periodic
        # exact refresh keeps its cadence). The auto branch seeds BOTH
        # schemes so the fused gate's cost model can switch between
        # them without leaving the single-roundtrip path.
        old = _PLAN_CACHE.get(((n, h, w), bits))
        plans = old["plans"] if old else {}
        for sch, p in seed_plans.items():
            plans[sch] = None if p is None else {
                "rem_npads": p[2], "un_npads": p[3], "est": p[5]}
        _PLAN_CACHE[((n, h, w), bits)] = {
            "plans": plans, "uses": old["uses"] if old else 0}
    except Exception:
        # A pass-2 / unpack failure must not take down a serving
        # loop: report every byte that already crossed the link (map,
        # and the blob if pass 2 got that far) so the accounting stays
        # exact, warn so a real unpack regression isn't an invisible
        # fallback, and let the caller pick the next scheme.
        from ..utils import counters
        from ..utils.log import get_logger

        counters.bump("rice_readback_fallback")
        get_logger().warning("rice readback pack failed; falling back",
                             exc_info=True)
        return None, maps_nbytes + blob_bytes
    return out, blob_bytes + maps_nbytes


def fetch_rgba1010102_rice(out_dev, fetch=np.asarray):
    """Fetch an (n, h, w) device RGBA1010102 batch via the RCT + Rice
    segment pack (two device passes, one map fetch + one blob fetch).
    Returns (host u32 (n, h, w), d2h_bytes), or (None, wasted_bytes)
    when the content is incompressible or too large for the sort-key
    index field (caller falls back)."""
    return _fetch_rice_core(out_dev, fetch, bits=10, med=False)


def fetch_rgba1010102_med(out_dev, fetch=np.asarray):
    """RCT + MED/LOCO-I prediction + Rice: ~14% fewer bytes than the
    vertical-delta scheme on decoded bench content (2-D prediction
    adapts to horizontal gradients too). Same bucket/unary blob
    layout; host reconstruction is the sequential predictor pass in
    jpeg/native/packio.cpp EmitMed (callers should require the native
    unpacker — the numpy fallback is a per-pixel Python loop)."""
    return _fetch_rice_core(out_dev, fetch, bits=10, med=True)


def fetch_rgba_f16_med(out_dev, fetch=np.asarray):
    """F16-halves variant of the MED pack (~10% fewer bytes than
    fetch_rgba_f16_rice on decoded bench content)."""
    return _fetch_rice_core(out_dev, fetch, bits=16, med=True)


def fetch_rgba1010102_auto(out_dev, fetch=np.asarray):
    """Per-batch best of the vertical and MED schemes: one fused
    pass 1 computes both stats, the host compares exact packed-size
    estimates, pass 2 packs the winner (falls back to vertical-only
    when the native MED unpacker is missing)."""
    return _fetch_rice_core(out_dev, fetch, bits=10, med="auto")


def fetch_rgba_f16_auto(out_dev, fetch=np.asarray):
    """F16-halves variant of the auto scheme pick."""
    return _fetch_rice_core(out_dev, fetch, bits=16, med="auto")


def _rice_word_offs(rem_npads, un_npads, kset=_RICE_KS):
    """Word offsets of each bucket inside a fused Rice blob (shared by
    the 10-bit and F16 variants; layouts must stay in lockstep with
    _rice_devpack_fn)."""
    rem_word_offs = np.zeros(len(kset), np.int64)
    acc = 0
    for j, k in enumerate(kset):
        rem_word_offs[j] = acc
        if k:
            acc += rem_npads[j] * _wps(k, RL)
    un_word_offs = np.zeros(len(_RICE_UCLS), np.int64)
    for c in range(len(_RICE_UCLS)):
        un_word_offs[c] = acc
        acc += un_npads[c] * _RICE_UCLS[c]
    return rem_word_offs, un_word_offs


def _host_unpack_rice_core(blob, kmap, uwmap, rem_counts, un_counts,
                           rem_npads, un_npads, n, h, w, *, kset,
                           zero_code, native_fn, out_shape, out_dtype,
                           tail):
    """Host half shared by the 10-bit and F16 Rice packs: native
    single-pass C++ (MT when >1 worker) when available, else a
    vectorized numpy fallback (identical output). The spec arguments
    pick the variant; the bucket/unary layouts are identical and must
    stay in lockstep with _rice_devpack_fn."""
    from ..jpeg import native

    rem_word_offs, un_word_offs = _rice_word_offs(rem_npads, un_npads,
                                                  kset)
    lib = native.get_lib()
    if lib is not None and getattr(lib, native_fn, None):
        import ctypes

        blob = np.ascontiguousarray(blob)
        kmap_c = np.ascontiguousarray(kmap)
        uw_c = np.ascontiguousarray(uwmap)
        scratch = np.empty(n * h * w, np.uint16)
        out = np.empty(out_shape, out_dtype)
        cptr = {np.uint32: ctypes.c_uint32,
                np.uint16: ctypes.c_uint16,
                np.uint8: ctypes.c_uint8}[out_dtype]
        args = (
            kmap_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            uw_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rem_word_offs.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)),
            un_word_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, h, w,
            scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.ctypes.data_as(ctypes.POINTER(cptr)))
        nt = _unpack_threads()
        mt = getattr(lib, native_fn + "_mt", None)
        t0 = time.perf_counter()
        rc = mt(*args, nt) if (nt > 1 and mt) \
            else getattr(lib, native_fn)(*args)
        if rc == 0:
            # Unpack-speed sample (raw output bytes/s) for the
            # cost-aware scheme pick in _fetch_rice_core.
            _bps_update(native_fn, out.nbytes,
                        time.perf_counter() - t0)
            return out

    # Numpy fallback: reconstruct z per bucket, then the variant's
    # delta/RCT tail.
    nseg = kmap.size
    z = np.zeros((nseg, RL), np.uint16)
    for j, k in enumerate(kset):
        c = int(rem_counts[j])
        if k == 0 or c == 0:
            continue
        nw = _wps(k, RL)
        words = blob[rem_word_offs[j]:rem_word_offs[j] + c * nw] \
            .reshape(c, nw)
        ks = 32 // k
        maskv = np.uint32((1 << k) - 1)
        parts = ((words[None, :, :]
                  >> (np.arange(ks, dtype=np.uint32) * k)[:, None, None])
                 & maskv).astype(np.uint16)
        segs = parts.transpose(1, 0, 2).reshape(c, ks * nw)[:, :RL]
        idx = np.flatnonzero(kmap == k)
        z[idx] = segs
    ucls_lim = np.asarray(_RICE_UCLS, np.int64)
    ucls = np.searchsorted(ucls_lim, uwmap.astype(np.int64))
    nonzero = kmap != zero_code
    for c in range(len(_RICE_UCLS)):
        cnt = int(un_counts[c])
        if cnt == 0:
            continue
        wc = _RICE_UCLS[c]
        words = blob[un_word_offs[c]:un_word_offs[c] + cnt * wc] \
            .reshape(cnt, wc)
        bits = ((words[:, :, None]
                 >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1) \
            .reshape(cnt, wc * 32)
        rows_i, cols = np.nonzero(bits)
        assert rows_i.size == cnt * RL, "corrupt unary bitmap"
        cols = cols.reshape(cnt, RL).astype(np.int64)
        q = np.empty((cnt, RL), np.int64)
        q[:, 0] = cols[:, 0]
        q[:, 1:] = np.diff(cols, axis=1) - 1
        idx = np.flatnonzero(nonzero & (ucls == c))
        ksel = kmap[idx].astype(np.uint16)
        z[idx] = ((q.astype(np.uint16) << ksel[:, None]) | z[idx])
    return tail(z, n, h, w)


def _rct_tail_numpy(z, n, h, w, seglen: int = RL):
    """Shared numpy tail of both readback packs: un-zigzag, grouped
    cumsum, RCT recorrelate, RGBA1010102 pack. z: (nseg, seglen) u16
    zigzag deltas in original segment order. i16 arithmetic throughout
    (deltas fit: |ds| <= 512, grouped cumsum <= 32*512, recorrelated
    sum <= 2046) to halve memory traffic on the single host core."""
    wp = -(-w // seglen) * seglen
    rows = 3 * n * h
    zz = z.reshape(rows, wp).view(np.int16)
    ds = (zz >> 1) ^ -(zz & 1)
    pad = (-rows) % G                  # tail group may be partial
    if pad:
        ds = np.concatenate([ds, np.zeros((pad, wp), ds.dtype)])
    grp = ds.reshape(-1, G, wp)
    np.cumsum(grp, axis=1, out=grp)
    big = grp.reshape(-1, wp)[:rows, :w]
    big &= 1023
    gpl = big[:n * h].reshape(n, h, w)
    rpl = (big[n * h:2 * n * h].reshape(n, h, w) + gpl) & 1023
    bpl = (big[2 * n * h:].reshape(n, h, w) + gpl) & 1023
    return (rpl.astype(np.uint32) | (gpl.astype(np.uint32) << 10)
            | (bpl.astype(np.uint32) << 20) | np.uint32(0xC0000000))


def _host_unpack_rct(blob, bmap, counts, npads, n, h, w):
    """Host half of the RCT fine-width pack: native single-pass C++
    (jpeg/native/packio.cpp) when available, else the vectorized numpy
    fallback (identical output, ~10x slower on one core)."""
    from ..jpeg import native

    lib = native.get_lib()
    if lib is not None and getattr(lib, "uhdr_rctseg_unpack", None):
        import ctypes

        woffs = np.zeros(len(FINE_WIDTHS), np.int64)
        acc = 0
        for j, bw in enumerate(FINE_WIDTHS):
            woffs[j] = acc
            acc += npads[j] * _wps(bw, LF)
        # np.asarray of a device array can come back F-contiguous on
        # some platforms (the axon relay does this for 2-D fetches);
        # the C side reads raw row-major memory, so force C order.
        blob = np.ascontiguousarray(blob)
        bmap = np.ascontiguousarray(bmap)
        scratch = np.empty(n * h * w, np.uint16)
        out = np.empty((n, h, w), np.uint32)
        rc = lib.uhdr_rctseg_unpack(
            bmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            woffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, h, w,
            scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        if rc == 0:
            return out

    # Numpy fallback: rebuild perm exactly as the device sort ordered
    # the buckets (ascending width rank, then segment index), then the
    # shared delta/RCT tail.
    flat_b = bmap.ravel()
    perm = np.zeros(flat_b.size, np.int32)
    base = 1
    boff = 0
    rows_list = [np.zeros((1, LF), np.uint16)]
    for j, bw in enumerate(FINE_WIDTHS):
        c = int(counts[j + 1])
        npad = npads[j]
        nw = _wps(bw, LF)
        words = blob[boff:boff + npad * nw].reshape(npad, nw)[:c]
        boff += npad * nw
        k = 32 // bw
        mask = np.uint32((1 << bw) - 1)
        parts = ((words[None, :, :]
                  >> (np.arange(k, dtype=np.uint32) * bw)[:, None, None])
                 & mask).astype(np.uint16)
        rows_list.append(parts.transpose(1, 0, 2).reshape(
            c, k * nw)[:, :LF])
        idx = np.nonzero(flat_b == bw)[0]
        perm[idx] = base + np.arange(c, dtype=np.int32)
        base += c
    allrows = np.concatenate(rows_list, axis=0)
    return _rct_tail_numpy(allrows[perm], n, h, w, seglen=LF)


# ---------------------------------------------------------------------------
# F16 readback: RCT + Rice over half-float bit patterns.
#
# The reference's DEFAULT decode output is RGBA_F16
# (/root/reference/lib/src/ultrahdr_api.cpp:1287-1289, 64bpp) — a raw
# 4K readback is ~100 MB/frame, ~3 s at this relay's best. The same
# RCT + Rice machinery applies almost unchanged to the u16 bit
# patterns: for positive halves the bit pattern is monotone in the
# value (sign=0, exponent-then-mantissa ordering), so channel
# differences (R-G, B-G mod 2^16) and vertical deltas of smooth linear
# HDR content stay small and Rice(k) adapts per 256-sample segment.
# Alpha is pack_rgba_f16's constant 0x3C00 (1.0), dropped on pack and
# re-attached on unpack. Only the widths differ from the 1010102 pack:
# k in 0..15 (zigzag deltas fit u16; k=15 always satisfies the unary
# cap since q <= 1), zero-segment sentinel 31.
# ---------------------------------------------------------------------------

_RICE16_KS = tuple(range(16))
_RICE16_ZERO = 31


def _rice16_widths_fn(shape):
    return _pass1_widths_fn(shape, 16, False)


def fetch_rgba_f16_rice(out_dev, fetch=np.asarray):
    """Fetch an (n, h, w, 4) device RGBA-F16-halves batch via the
    RCT + Rice bit-pattern pack. Returns (host u16 (n, h, w, 4),
    d2h_bytes) or (None, wasted_bytes) when the content is
    incompressible / too large for the sort-key index field (caller
    falls back to a raw fetch). Alpha comes back as the packer's
    constant 0x3C00 (ops/color.py pack_rgba_f16)."""
    return _fetch_rice_core(out_dev, fetch, bits=16, med=False)


def _rct16_tail_numpy(z, n, h, w):
    """Numpy tail of the F16 pack: un-zigzag (i32: z can be > 32767),
    grouped cumsum, mod-2^16 recorrelate, interleave RGBA u16 with the
    constant alpha 0x3C00."""
    wp = -(-w // RL) * RL
    rows = 3 * n * h
    zz = z.reshape(rows, wp).astype(np.int32)
    ds = (zz >> 1) ^ -(zz & 1)
    pad = (-rows) % G                  # tail group may be partial
    if pad:
        ds = np.concatenate([ds, np.zeros((pad, wp), ds.dtype)])
    grp = ds.reshape(-1, G, wp)
    np.cumsum(grp, axis=1, out=grp)
    big = grp.reshape(-1, wp)[:rows, :w]
    big &= 0xFFFF
    gpl = big[:n * h]
    rpl = (big[n * h:2 * n * h] + gpl) & 0xFFFF
    bpl = (big[2 * n * h:] + gpl) & 0xFFFF
    out = np.empty((n * h, w, 4), np.uint16)
    out[..., 0] = rpl.astype(np.uint16)
    out[..., 1] = gpl.astype(np.uint16)
    out[..., 2] = bpl.astype(np.uint16)
    out[..., 3] = 0x3C00
    return out.reshape(n, h, w, 4)


def _med_tail_numpy(z, n, h, w, bits):
    """Numpy reconstruction for the MED packs: strictly sequential in
    (row, column) per 32-row group, so this is a per-pixel Python loop
    — correct but slow; production unpacks go through the native
    EmitMed (callers gate MED selection on its presence)."""
    mask = (1 << bits) - 1
    wp = -(-w // RL) * RL
    rows = 3 * n * h
    zz = z.reshape(rows, wp)[:, :w].astype(np.int64)
    res = (zz >> 1) ^ -(zz & 1)
    big = np.zeros((rows, w), np.int64)
    for r in range(rows):
        gstart = r % G == 0
        prevr = big[r - 1]
        rrow = res[r]
        brow = big[r]
        left = 0
        for x in range(w):
            up = 0 if gstart else prevr[x]
            ul = 0 if (gstart or x == 0) else prevr[x - 1]
            mx = left if left > up else up
            mn = left if left < up else up
            pred = mn if ul >= mx else (mx if ul <= mn else
                                        left + up - ul)
            left = (pred + rrow[x]) & mask
            brow[x] = left
    gpl = big[:n * h]
    rpl = (big[n * h:2 * n * h] + gpl) & mask
    bpl = (big[2 * n * h:] + gpl) & mask
    if bits == 10:
        return (rpl.astype(np.uint32)
                | (gpl.astype(np.uint32) << 10)
                | (bpl.astype(np.uint32) << 20)
                | np.uint32(0xC0000000)).reshape(n, h, w)
    out = np.empty((n * h, w, 4), np.uint16)
    out[..., 0] = rpl.astype(np.uint16)
    out[..., 1] = gpl.astype(np.uint16)
    out[..., 2] = bpl.astype(np.uint16)
    out[..., 3] = 0x3C00
    return out.reshape(n, h, w, 4)


def _med10_tail_numpy(z, n, h, w):
    return _med_tail_numpy(z, n, h, w, 10)


def _med16_tail_numpy(z, n, h, w):
    return _med_tail_numpy(z, n, h, w, 16)


def _vert8_tail_numpy(z, n, h, w, seglen: int = RL):
    """Planar-u8 vertical-delta tail: un-zigzag, grouped cumsum, mod
    256; no recorrelation (the three "planes" are the composite's
    thirds)."""
    wp = -(-w // seglen) * seglen
    rows = 3 * n * h
    zz = z.reshape(rows, wp).view(np.int16)
    ds = (zz >> 1) ^ -(zz & 1)
    pad = (-rows) % G
    if pad:
        ds = np.concatenate([ds, np.zeros((pad, wp), ds.dtype)])
    grp = ds.reshape(-1, G, wp)
    np.cumsum(grp, axis=1, out=grp)
    big = grp.reshape(-1, wp)[:rows, :w]
    return (big & 255).astype(np.uint8).reshape(n, 3 * h, w)


def _med8_tail_numpy(z, n, h, w):
    """Planar-u8 MED tail: sequential LOCO-I reconstruction mod 256,
    no recorrelation (slow python loop — production goes native)."""
    mask = 255
    wp = -(-w // RL) * RL
    rows = 3 * n * h
    zz = z.reshape(rows, wp)[:, :w].astype(np.int64)
    res = (zz >> 1) ^ -(zz & 1)
    big = np.zeros((rows, w), np.int64)
    for r in range(rows):
        gstart = r % G == 0
        prevr = big[r - 1]
        rrow = res[r]
        brow = big[r]
        left = 0
        for x in range(w):
            up = 0 if gstart else prevr[x]
            ul = 0 if (gstart or x == 0) else prevr[x - 1]
            mx = left if left > up else up
            mn = left if left < up else up
            pred = mn if ul >= mx else (mx if ul <= mn else
                                        left + up - ul)
            left = (pred + rrow[x]) & mask
            brow[x] = left
    return big.astype(np.uint8).reshape(n, 3 * h, w)


# Per-bits dispatch for the shared fetch core: native unpack entry
# points and numpy-fallback tails. bits=8 is the planar composite
# readback (decode intermediates); 10/16 the pixel readbacks.
_MED_FN_BY_BITS = {8: "uhdr_med8_unpack", 10: "uhdr_med_unpack",
                   16: "uhdr_med16_unpack"}
_VERT_FN_BY_BITS = {8: "uhdr_rice8_unpack", 10: "uhdr_rice_unpack",
                    16: "uhdr_rice16_unpack"}
_MED_TAIL_BY_BITS = {8: _med8_tail_numpy, 10: _med10_tail_numpy,
                     16: _med16_tail_numpy}
_VERT_TAIL_BY_BITS = {8: _vert8_tail_numpy, 10: _rct_tail_numpy,
                      16: _rct16_tail_numpy}


def fetch_planes_u8(out_dev, fetch=np.asarray):
    """Packed readback of an (n, 3*h, w) u8 planar composite (the
    fused decode's integer intermediates: [Y | U|V | gain map] padded
    to three equal thirds). Rice residual pack, scheme auto-picked;
    returns (host u8 array, d2h_bytes) or (None, wasted) for
    incompressible content (caller falls back to a raw fetch)."""
    return _fetch_rice_core(out_dev, fetch, bits=8, med="auto")


def fetch_planes_u8_med(out_dev, fetch=np.asarray):
    return _fetch_rice_core(out_dev, fetch, bits=8, med=True)


def fetch_planes_u8_vert(out_dev, fetch=np.asarray):
    return _fetch_rice_core(out_dev, fetch, bits=8, med=False)
