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

from functools import lru_cache

import numpy as np

L = 256      # samples per segment (lane tile)
G = 32       # rows per delta group (row 0 of each group is raw)
WIDTHS = (2, 5, 10)          # nonzero packed widths; 0 = all-zero seg
_POW2_MIN = 256              # bucket-count quantization floor


def _slots(b: int) -> int:
    return 32 // b           # samples per u32 word (2->16, 5->6, 10->3)


def _words_per_seg(b: int) -> int:
    k = _slots(b)
    return -(-L // k)


def _pow2_pad(n: int) -> int:
    """Quantize bucket sizes so compiled unpack variants stay few:
    powers of two up to 2048, then multiples of 2048 (bounds padding
    waste at 2047 segments ~ 650 KB in the widest bucket)."""
    p = _POW2_MIN
    while p < n and p < 2048:
        p <<= 1
    if n <= p:
        return p
    return -(-n // 2048) * 2048


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
    multiple of G (pad beforehand if not); W is padded internally."""
    h, w = arr.shape
    if h % G:
        raise ValueError(f"H={h} not a multiple of {G}")
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
