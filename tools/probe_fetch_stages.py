#!/usr/bin/env python
"""On-chip diagnostic: attribute the packed-readback latency stack.

VERDICT r4 found ~900 ms/frame of the decode fetch unexplained by the
bytes/link-speed floor. This probe runs the production fetch path on
the real chip with UHDR_FETCH_SYNC_STAGES=1 and prints the per-stage
breakdown (pass-1 dispatch, map fetch, host plan, pass-2 device time,
blob transfer, native unpack) for both the RGBA1010102 and F16 paths,
plus the decode dispatch and h2d upload around them.

Usage: python tools/probe_fetch_stages.py [--frames 4] [--rounds 2]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ["UHDR_FETCH_SYNC_STAGES"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def synth_p010(h, w, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.integers(64, 940, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    y = np.kron(small, np.ones((32, 32), np.float32))[:h, :w]
    y = (y + np.roll(y, 7, 0) + np.roll(y, 7, 1)) / 3.0
    y10 = np.clip(y, 64, 940).astype(np.uint16) << 6
    uvs = rng.integers(448, 576, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    uv_small = np.kron(uvs, np.ones((16, 32), np.float32))[:h // 2,
                                                           :w // 2]
    uv = np.empty((h // 2, w), np.uint16)
    uv[:, 0::2] = np.clip(uv_small, 64, 960).astype(np.uint16) << 6
    uv[:, 1::2] = np.clip(uv_small[:, ::-1], 64,
                          960).astype(np.uint16) << 6
    return y10, uv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--width", type=int, default=4080)
    ap.add_argument("--height", type=int, default=3072)
    args = ap.parse_args()

    import jax

    from libultrahdr_dev_tpu.parallel import sharding

    W, H, FRAMES = args.width, args.height, args.frames
    print(f"device: {jax.devices()[0]}", flush=True)
    mesh = sharding.default_mesh(jax.devices()[:1])
    boost = 1000 / 203

    ys = np.stack([synth_p010(H, W, seed=i)[0] for i in range(FRAMES)])
    uvs = np.stack([synth_p010(H, W, seed=i)[1] for i in range(FRAMES)])

    # Link weather context.
    probe = np.zeros(8 << 20, np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(probe)
    d.block_until_ready()
    h2d = 8.0 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(d)
    d2h = 8.0 / (time.perf_counter() - t0)
    print(f"link: h2d {h2d:.1f} MB/s  d2h {d2h:.1f} MB/s", flush=True)

    # Warm everything once.
    stats = {}
    pre = sharding.pack_p010_batch_host(ys, uvs)
    ydev, uvdev, _ = sharding.upload_p010_batch(ys, uvs, stats, pre)
    blobs = sharding.batched_encode_api0(
        ys, uvs, mesh, device_input=(ydev, uvdev), stats=stats)
    out = sharding.batched_decode(blobs, "hdr_hlg", boost, mesh,
                                  stats=stats)
    sharding.fetch_1010102_packed(out, stats)
    out16 = sharding.batched_decode(blobs, "hdr_linear", boost, mesh)
    sharding.fetch_f16_packed(out16)
    print("warmup done", flush=True)

    for r in range(args.rounds):
        rec = {"round": r}
        rstats = {}
        t0 = time.perf_counter()
        ydev, uvdev, _ = sharding.upload_p010_batch(ys, uvs, rstats, pre)
        t1 = time.perf_counter()
        blobs = sharding.batched_encode_api0(
            ys, uvs, mesh, device_input=(ydev, uvdev), stats=rstats)
        t2 = time.perf_counter()
        out = sharding.batched_decode(blobs, "hdr_hlg", boost, mesh,
                                      stats=rstats)
        t3 = time.perf_counter()
        px = sharding.fetch_1010102_packed(out, rstats)
        t4 = time.perf_counter()
        rec["upload_ms"] = round((t1 - t0) * 1e3, 1)
        rec["encode_ms"] = round((t2 - t1) * 1e3, 1)
        rec["decode_dispatch_ms"] = round((t3 - t2) * 1e3, 1)
        rec["fetch_1010102_ms"] = round((t4 - t3) * 1e3, 1)
        rec["stats_1010102"] = {
            k: v for k, v in rstats.items() if k != "h2d_pack"}
        # F16 on the same blobs.
        fstats = {}
        t5 = time.perf_counter()
        out16 = sharding.batched_decode(blobs, "hdr_linear", boost,
                                        mesh, stats=fstats)
        t6 = time.perf_counter()
        px16 = sharding.fetch_f16_packed(out16, fstats)
        t7 = time.perf_counter()
        rec["decode16_dispatch_ms"] = round((t6 - t5) * 1e3, 1)
        rec["fetch_f16_ms"] = round((t7 - t6) * 1e3, 1)
        rec["stats_f16"] = fstats
        assert px.shape == (FRAMES, H, W)
        assert px16.shape == (FRAMES, H, W, 4)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
