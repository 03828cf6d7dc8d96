#!/usr/bin/env python
"""Micro-benchmarks mirroring the reference's measurement points:

- ProfileGainMapFuncs (tests/jpegr_test.cpp:2203-2304): generateGainMap
  / applyGainMap ms over 1280x720, mean of 10 iters
- benchmark_test.cpp configs: encode API-0/1 and decode at 12MP
  (4080x3072) and 3MP (2048x1536)

Run on the TPU chip (default platform) or CPU (JAX_PLATFORMS=cpu).
Usage: python benchmarks/microbench.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

# Runnable as a plain script from anywhere: the package lives one
# directory up from this file.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, iters=10, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1000.0


def synth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.integers(64, 940, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    y = np.kron(small, np.ones((32, 32), np.float32))[:h, :w]
    y10 = np.clip(y, 64, 940).astype(np.uint16) << 6
    uv = np.full((h // 2, w), 512 << 6, np.uint16)
    return y10, uv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    iters = 3 if args.quick else 10

    import jax
    from libultrahdr_dev_tpu.ops import gainmap as gm
    from libultrahdr_dev_tpu.jpegr import JpegR
    from libultrahdr_dev_tpu.parallel import sharding
    from libultrahdr_dev_tpu.types import (ColorGamut, ColorTransfer,
                                           OutputFormat, PixelFormat,
                                           RawImage)

    print(f"device: {jax.devices()[0]}")
    jr = JpegR()
    mesh = sharding.default_mesh(jax.devices()[:1])

    # --- ProfileGainMapFuncs parity: 1280x720 ---
    w, h = 1280, 720
    y10, uv = synth(h, w)
    y8, u8, v8 = (np.asarray(p) for p in gm.tonemap_p010(y10, uv))

    def gen():
        g, _ = gm.generate_gainmap(y8, u8, v8, y10, uv,
                                   sdr_gamut="bt2100", hdr_gamut="bt2100",
                                   hdr_tf="hlg")
        np.asarray(g)

    print(f"generateGainMap 1280x720: {timeit(gen, iters):.2f} ms "
          f"(reference: 13.0 ms on this host)")

    gmap, md = gm.generate_gainmap(y8, u8, v8, y10, uv,
                                   sdr_gamut="bt2100", hdr_gamut="bt2100",
                                   hdr_tf="hlg")
    gmap = np.asarray(gmap)

    def apply_():
        out = gm.apply_gainmap(y8, u8, v8, gmap, md, "hdr_linear",
                               md.max_content_boost)
        np.asarray(out)

    print(f"applyGainMap 1280x720 (F16 + readback): "
          f"{timeit(apply_, iters):.2f} ms")

    # --- benchmark_test configs ---
    for label, (bw_, bh_) in (("3MP 2048x1536", (2048, 1536)),
                              ("12MP 4080x3072", (4080, 3072))):
        if args.quick and "12MP" in label:
            continue
        y10, uv = synth(bh_, bw_, seed=1)

        def enc():
            sharding.batched_encode_api0(y10[None], uv[None], mesh)

        enc()  # warm/compile
        print(f"encode API-0 {label}: {timeit(enc, max(iters // 2, 2)):.1f} ms")

        blob = sharding.batched_encode_api0(y10[None], uv[None], mesh)[0]

        def dec():
            res = jr.decode(blob, OutputFormat.HDR_HLG, 4.926)
            np.asarray(res.image.planes["rgba"])

        dec()
        print(f"decode->HLG {label}: {timeit(dec, max(iters // 2, 2)):.1f} ms")


if __name__ == "__main__":
    sys.exit(main())
