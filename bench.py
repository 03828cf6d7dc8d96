#!/usr/bin/env python
"""Headline benchmark: 4K JPEG/R encode+decode ms/frame on one chip.

Prints ONE JSON line:
  {"metric": "4k_jpegr_encode_decode", "value": <ms/frame>,
   "unit": "ms", "vs_baseline": <speedup vs reference>}

Baseline: the reference implementation compiled on this machine
(tools/build_reference_oracle.sh) measured 25.5 ms encode + 115 ms
decode at 1280x720 (BASELINE.md); scaled by pixel count to 4080x3072
(13.6x) -> 1911 ms/frame for encode+decode on one x86 core.
"""

import json
import sys
import time

import numpy as np

BASELINE_4K_MS = 1911.0
W, H = 4080, 3072
ITERS = 3


def synth_p010(h, w, seed=0):
    """Natural-ish smooth HDR content (band-limited, so entropy coding
    sees realistic coefficient statistics)."""
    rng = np.random.default_rng(seed)
    small = rng.integers(64, 940, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    y = np.kron(small, np.ones((32, 32), np.float32))[:h, :w]
    # light smoothing to spread energy into low AC bands
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

    from libultrahdr_dev_tpu.jpegr import JpegR
    from libultrahdr_dev_tpu.parallel import sharding
    from libultrahdr_dev_tpu.types import OutputFormat

    dev = jax.devices()[0]
    y10, uv = synth_p010(H, W)
    mesh = sharding.default_mesh(jax.devices()[:1])
    jr = JpegR()

    # Warmup (compiles the 4K kernels). Decode to RGBA1010102/HLG — the
    # same output the reference's benchmark_test decode configs use.
    blobs = sharding.batched_encode_api0(y10[None], uv[None], mesh)
    res = jr.decode(blobs[0], OutputFormat.HDR_HLG,
                    max_display_boost=1000 / 203)
    np.asarray(res.image.planes["rgba"])

    enc_ms = []
    dec_ms = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        blobs = sharding.batched_encode_api0(y10[None], uv[None], mesh)
        t1 = time.perf_counter()
        res = jr.decode(blobs[0], OutputFormat.HDR_HLG,
                        max_display_boost=1000 / 203)
        np.asarray(res.image.planes["rgba"])
        t2 = time.perf_counter()
        enc_ms.append((t1 - t0) * 1000)
        dec_ms.append((t2 - t1) * 1000)

    enc = min(enc_ms)
    dec = min(dec_ms)
    total = enc + dec
    result = {
        "metric": "4k_jpegr_encode_decode",
        "value": round(total, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_4K_MS / total, 3),
        "detail": {
            "encode_ms": round(enc, 2),
            "decode_ms": round(dec, 2),
            "device": str(dev),
            "jpegr_bytes": len(blobs[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
