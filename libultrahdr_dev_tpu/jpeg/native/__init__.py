"""Loader for the native (C++) Huffman entropy codec.

Compiles entropy.cpp with g++ on first use into a cached shared object
(next to the source, keyed by source mtime) and exposes it via ctypes.
Falls back to None if no compiler is available; callers then use the
pure-numpy path in huffman.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_SRCS = [os.path.join(_DIR, "entropy.cpp"),
         os.path.join(_DIR, "arith.cpp"),
         os.path.join(_DIR, "packio.cpp"),
         os.path.join(_DIR, "apply.cpp")]
_FLAGS = ["-O3", "-march=native", "-funroll-loops", "-std=c++17",
          # errno bookkeeping on sqrt/floor blocks vectorization of
          # the apply-kernel rows; results are unchanged without it.
          "-fno-math-errno",
          "-shared", "-fPIC", "-pthread"]


def _host_tag() -> str:
    """Cache key tying the -march=native binary to THIS host's ISA and
    the compile flags: a checkout copied between hosts with different
    CPUs must rebuild instead of SIGILL-ing on a stale binary, and a
    flags change must invalidate the cache even when source mtimes
    don't move."""
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat = line
                    break
    except OSError:
        pass
    blob = "|".join([platform.machine(), feat, *_FLAGS])
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


_SO = os.path.join(_DIR, f"_entropy-{_host_tag()}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        src_m = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_m:
            return True
        subprocess.run(
            ["g++", *_FLAGS, *_SRCS, "-o", _SO + ".tmp"],
            check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.uhdr_huff_encode.restype = ctypes.c_long
        lib.uhdr_huff_encode.argtypes = [
            i16p, ctypes.c_long, u8p, ctypes.c_int, u8p, u8p,
            u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_long]
        lib.uhdr_huff_decode.restype = ctypes.c_long
        lib.uhdr_huff_decode.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, ctypes.c_int,
            u8p, u8p, u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
            i16p]
        lib.uhdr_prog_dc_first.restype = ctypes.c_long
        lib.uhdr_prog_dc_first.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, ctypes.c_int,
            u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p]
        lib.uhdr_prog_dc_refine.restype = ctypes.c_long
        lib.uhdr_prog_dc_refine.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i16p]
        lib.uhdr_prog_ac_first.restype = ctypes.c_long
        lib.uhdr_prog_ac_first.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p]
        lib.uhdr_prog_ac_refine.restype = ctypes.c_long
        lib.uhdr_prog_ac_refine.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p]
        lp = ctypes.POINTER(ctypes.c_long)
        lib.uhdr_huff_scan_offsets.restype = ctypes.c_long
        lib.uhdr_huff_scan_offsets.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, ctypes.c_int,
            u8p, u8p, u8p, u8p, u8p, u8p, ctypes.c_int, u8p, lp]
        # Arithmetic (QM) codec entry points (arith.cpp).
        lib.uhdr_arith_decode_seq.restype = ctypes.c_long
        lib.uhdr_arith_decode_seq.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, ctypes.c_int,
            u8p, u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
            i16p]
        lib.uhdr_arith_encode_seq.restype = ctypes.c_long
        lib.uhdr_arith_encode_seq.argtypes = [
            i16p, ctypes.c_long, u8p, ctypes.c_int,
            u8p, u8p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_long]
        lib.uhdr_arith_prog_dc_first.restype = ctypes.c_long
        lib.uhdr_arith_prog_dc_first.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, u8p, ctypes.c_int,
            u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p]
        lib.uhdr_arith_prog_dc_refine.restype = ctypes.c_long
        lib.uhdr_arith_prog_dc_refine.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i16p]
        lib.uhdr_arith_prog_ac_first.restype = ctypes.c_long
        lib.uhdr_arith_prog_ac_first.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p]
        lib.uhdr_arith_prog_ac_refine.restype = ctypes.c_long
        lib.uhdr_arith_prog_ac_refine.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i16p]
        # RCT segment-pack unpack (packio.cpp).
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.uhdr_rctseg_unpack.restype = ctypes.c_long
        lib.uhdr_rctseg_unpack.argtypes = [
            u8p, u32p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u32p]
        lib.uhdr_rice_unpack.restype = ctypes.c_long
        lib.uhdr_rice_unpack.argtypes = [
            u8p, u8p, u32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u32p]
        lib.uhdr_rice16_unpack.restype = ctypes.c_long
        lib.uhdr_rice16_unpack.argtypes = [
            u8p, u8p, u32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u16p]
        # Multi-threaded variants (min(cores,4) workers, the
        # reference JobQueue's sizing — ultrahdr.cpp:131-183).
        lib.uhdr_rice_unpack_mt.restype = ctypes.c_long
        lib.uhdr_rice_unpack_mt.argtypes = [
            u8p, u8p, u32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u32p, ctypes.c_long]
        lib.uhdr_rice16_unpack_mt.restype = ctypes.c_long
        lib.uhdr_rice16_unpack_mt.argtypes = [
            u8p, u8p, u32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u16p, ctypes.c_long]
        # MED-predicted variants (same signatures as the rice ones).
        lib.uhdr_med_unpack.restype = ctypes.c_long
        lib.uhdr_med_unpack.argtypes = lib.uhdr_rice_unpack.argtypes
        lib.uhdr_med_unpack_mt.restype = ctypes.c_long
        lib.uhdr_med_unpack_mt.argtypes = \
            lib.uhdr_rice_unpack_mt.argtypes
        lib.uhdr_med16_unpack.restype = ctypes.c_long
        lib.uhdr_med16_unpack.argtypes = \
            lib.uhdr_rice16_unpack.argtypes
        lib.uhdr_med16_unpack_mt.restype = ctypes.c_long
        lib.uhdr_med16_unpack_mt.argtypes = \
            lib.uhdr_rice16_unpack_mt.argtypes
        # Planar-u8 composite variants (decode-intermediates readback).
        lib.uhdr_rice8_unpack.restype = ctypes.c_long
        lib.uhdr_rice8_unpack.argtypes = [
            u8p, u8p, u32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u8p]
        lib.uhdr_rice8_unpack_mt.restype = ctypes.c_long
        lib.uhdr_rice8_unpack_mt.argtypes = [
            u8p, u8p, u32p, i64p, i64p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, u16p, u8p, ctypes.c_long]
        lib.uhdr_med8_unpack.restype = ctypes.c_long
        lib.uhdr_med8_unpack.argtypes = lib.uhdr_rice8_unpack.argtypes
        lib.uhdr_med8_unpack_mt.restype = ctypes.c_long
        lib.uhdr_med8_unpack_mt.argtypes = \
            lib.uhdr_rice8_unpack_mt.argtypes
        # Host gain-map apply over the planes-readback composite.
        lib.uhdr_apply_gainmap.restype = ctypes.c_long
        lib.uhdr_apply_gainmap.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.uhdr_seg_widths.restype = ctypes.c_long
        lib.uhdr_seg_widths.argtypes = [
            u16p, ctypes.c_long, ctypes.c_long, u8p, i64p]
        lib.uhdr_seg_fill.restype = ctypes.c_long
        lib.uhdr_seg_fill.argtypes = [
            u16p, ctypes.c_long, ctypes.c_long, u8p, i64p, u32p, i32p]
        _lib = lib
        return _lib
