#!/usr/bin/env python
"""Headline benchmark: batched 4K JPEG/R encode+decode throughput on
one chip (ms/frame), pipelined like a production serving loop.

Prints ONE JSON line:
  {"metric": "4k_jpegr_encode_decode", "value": <ms/frame>,
   "unit": "ms", "vs_baseline": <speedup vs reference>}

Baseline: the reference implementation compiled on this machine
(tools/build_reference_oracle.sh) measured 25.5 ms encode + 115 ms
decode at 1280x720 (BASELINE.md); scaled by pixel count to 4080x3072
(13.6x) -> 1911 ms/frame for encode+decode on one x86 core.

Decode output is RGBA1010102/HLG (one of the reference benchmark's
decode configs). NOTE: in this harness the chip sits behind a relay
whose throughput fluctuates between ~13 and ~45 MB/s in BOTH
directions, so the headline (host pixels in, host pixels out) is
link-bound: ~23.5 MB packed P010 upload per encode and ~50 MB decoded
pixel readback per decode. The TPU itself is >10x faster than that:
the detail block reports device-compute times (encode ~125 ms/frame,
decode ~45 ms/frame including on-device Huffman decode of the restart
streams) and the measured link speed for normalization.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_4K_MS = 1911.0
W, H = 4080, 3072
FRAMES = 4


def synth_p010(h, w, seed=0):
    """Natural-ish smooth HDR content (band-limited, so entropy coding
    sees realistic coefficient statistics)."""
    rng = np.random.default_rng(seed)
    small = rng.integers(64, 940, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    y = np.kron(small, np.ones((32, 32), np.float32))[:h, :w]
    y = (y + np.roll(y, 7, 0) + np.roll(y, 7, 1)) / 3.0
    y10 = np.clip(y, 64, 940).astype(np.uint16) << 6
    uvs = rng.integers(448, 576, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    uv_small = np.kron(uvs, np.ones((16, 32), np.float32))[:h // 2, :w // 2]
    uv = np.empty((h // 2, w), np.uint16)
    uv[:, 0::2] = np.clip(uv_small, 64, 960).astype(np.uint16) << 6
    uv[:, 1::2] = np.clip(uv_small[:, ::-1], 64, 960).astype(np.uint16) << 6
    return y10, uv


def main():
    import jax

    from libultrahdr_dev_tpu.parallel import sharding

    dev = jax.devices()[0]
    mesh = sharding.default_mesh(jax.devices()[:1])
    boost = 1000 / 203

    ys = np.stack([synth_p010(H, W, seed=i)[0] for i in range(FRAMES)])
    uvs = np.stack([synth_p010(H, W, seed=i)[1] for i in range(FRAMES)])

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[-1]
        np.asarray(leaf[(0,) * leaf.ndim])

    def encode_all():
        return sharding.batched_encode_api0(ys, uvs, mesh)

    def decode_all(blobs):
        out = sharding.batched_decode(blobs, "hdr_hlg", boost, mesh)
        return np.asarray(out)

    # Warmup: compiles all 4K kernels + absorbs the first-transfer cost.
    blobs = encode_all()
    decode_all(blobs)

    # The relay link's throughput fluctuates 2-4x between runs; take
    # the best of three measurement rounds.
    enc = dec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        blobs = encode_all()
        t1 = time.perf_counter()
        pixels = decode_all(blobs)
        t2 = time.perf_counter()
        enc = min(enc, (t1 - t0) * 1000 / FRAMES)
        dec = min(dec, (t2 - t1) * 1000 / FRAMES)
    total = enc + dec

    # Decode-to-device (TPU-serving path: consumers read the decoded
    # planes on device, no host materialization). Sync via a jitted
    # scalar reduction: fetching even one ELEMENT of the result makes
    # this relay materialize the whole 200 MB buffer host-side, which
    # would mis-measure the serving path as link-bound.
    import jax.numpy as _jnp

    scalar_probe = jax.jit(lambda x: x.ravel()[0].astype(_jnp.float32))
    dec_dev = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = sharding.batched_decode(blobs, "hdr_hlg", boost, mesh)
        float(scalar_probe(out))
        dec_dev = min(dec_dev, (time.perf_counter() - t0) * 1000 / FRAMES)

    # Device-compute-only times: N frames chained inside ONE dispatch
    # (fori_loop, inputs perturbed per iteration to defeat CSE) so the
    # relay's ~30 ms per-dispatch/sync overhead amortizes away. These
    # are the framework's own numbers, independent of link weather.
    import math

    import jax.numpy as jnp

    from libultrahdr_dev_tpu.container import mux, xmp as xmp_mod
    from libultrahdr_dev_tpu.jpeg import device_decode as dd
    from libultrahdr_dev_tpu.jpeg import device_entropy as de
    from libultrahdr_dev_tpu.jpeg.dct import dequant_idct
    from libultrahdr_dev_tpu.jpeg.device_entropy import DEFAULT_CHUNK_CAP
    from libultrahdr_dev_tpu.ops import gainmap as gm

    NLOOP = 8
    mcus_x, mcus_y = W // 16, H // 16
    yh, yl = sharding.pack_p010_host(ys[0])
    uh, ul = sharding.pack_p010_host(uvs[0])
    dp = [jax.device_put(p) for p in (yh, yl, uh, ul)]
    sync(dp)

    @jax.jit
    def enc_many(yh, yl, uh, ul):
        def body(i, acc):
            yy = sharding._unpack_p010_device(yh + i.astype(jnp.uint8),
                                              yl)
            uu = sharding._unpack_p010_device(uh, ul)
            yz, uz, vz, gz = sharding._encode_one_image_coefs(
                yy, uu, "bt2100", "hlg", 95)
            inter = de.interleave_blocks_device(yz, uz, vz, mcus_x,
                                                mcus_y)
            sw, _, total, _ = de.encode_yuv420_rst_stream(
                inter, sharding.RST_INTERVAL, DEFAULT_CHUNK_CAP)
            gsw, _, gt, _ = de.encode_gray_rst_stream(
                gz, sharding.RST_INTERVAL, DEFAULT_CHUNK_CAP)
            # Consume the sorted streams so XLA can't dead-code-
            # eliminate the compaction sort.
            return (acc + total + gt + sw[0].astype(jnp.int32)
                    + gsw[0].astype(jnp.int32))
        return jax.lax.fori_loop(0, NLOOP, body, jnp.int32(0))

    out = enc_many(*dp)
    sync(out)
    enc_kernel = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = enc_many(*dp)
        sync(out)
        enc_kernel = min(enc_kernel,
                         (time.perf_counter() - t0) * 1000 / NLOOP)

    primary, gmapb = mux.extract_primary_and_gainmap(blobs[0])
    ds = dd.parse_device_stream(primary)
    dsg = dd.parse_device_stream(gmapb)
    md = xmp_mod.get_metadata_from_xmp(dsg.xmp)
    bch = jax.device_put(ds.chunks)
    gch = jax.device_put(dsg.chunks)
    sync((bch, gch))
    qb, qc_, qg = ds.qtables[0], ds.qtables[1], dsg.qtables[0]
    apply_k = gm._apply_kernel("hdr_hlg", 4, False)
    sc = (math.log2(md.min_content_boost),
          math.log2(md.max_content_boost), 1.0, md.max_content_boost)

    @jax.jit
    def dec_many(bch, gch):
        def body(i, acc):
            b = jnp.roll(bch, i, axis=0)
            g = jnp.roll(gch, i, axis=0)
            blocks = dd.decode_rst_chunks(b, ds.restart_interval,
                                          mcus_x * mcus_y, False)
            yz, uz, vz = dd.deinterleave_yuv420_device(blocks, mcus_x,
                                                       mcus_y)
            y8 = dequant_idct(yz, qb, mcus_y * 16, mcus_x * 16)[:H, :W]
            u8 = dequant_idct(uz, qc_, mcus_y * 8,
                              mcus_x * 8)[:H // 2, :W // 2]
            v8 = dequant_idct(vz, qc_, mcus_y * 8,
                              mcus_x * 8)[:H // 2, :W // 2]
            gb = dd.decode_rst_chunks(g, dsg.restart_interval,
                                      dsg.mcus_x * dsg.mcus_y, True)
            gp = dequant_idct(gb[: dsg.mcus_x * dsg.mcus_y], qg,
                              dsg.mcus_y * 8,
                              dsg.mcus_x * 8)[: dsg.height, : dsg.width]
            hdr = apply_k(y8, u8, v8, gp, jnp.float32(sc[0]),
                          jnp.float32(sc[1]), jnp.float32(sc[2]),
                          jnp.float32(sc[3]))
            return acc + hdr[0, 0].astype(jnp.uint32)
        return jax.lax.fori_loop(0, NLOOP, body, jnp.uint32(0))

    out = dec_many(bch, gch)
    sync(out)
    dec_kernel = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = dec_many(bch, gch)
        sync(out)
        dec_kernel = min(dec_kernel,
                         (time.perf_counter() - t0) * 1000 / NLOOP)

    # Context: measured link bandwidth (both directions fluctuate).
    probe = np.zeros(8 << 20, np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(probe)
    sync(d)
    h2d_mbps = 8.0 / max(time.perf_counter() - t0, 1e-9)
    t0 = time.perf_counter()
    np.asarray(d)
    d2h_mbps = 8.0 / max(time.perf_counter() - t0, 1e-9)

    result = {
        "metric": "4k_jpegr_encode_decode",
        "value": round(total, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_4K_MS / total, 3),
        "detail": {
            "encode_ms_per_frame": round(enc, 2),
            "decode_ms_per_frame": round(dec, 2),
            "decode_to_device_ms_per_frame": round(dec_dev, 2),
            "encode_device_compute_ms_per_frame": round(enc_kernel, 2),
            "decode_device_compute_ms_per_frame": round(dec_kernel, 2),
            "device_compute_vs_baseline": round(
                BASELINE_4K_MS / (enc_kernel + dec_kernel), 2),
            "frames": FRAMES,
            "device": str(dev),
            "jpegr_bytes": len(blobs[0]),
            "h2d_MBps": round(h2d_mbps, 1),
            "d2h_MBps": round(d2h_mbps, 1),
            "note": "headline is link-bound on this harness: 23.5MB "
                    "packed P010 upload per encode + 50MB pixel "
                    "readback per decode over a 7-45MB/s relay whose "
                    "throughput is weather; the *_device_compute_* "
                    "fields are dispatch-amortized TPU times (entropy "
                    "coding on device in both directions)",
        },
    }
    assert pixels.shape == (FRAMES, H, W)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
