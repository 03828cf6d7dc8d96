"""Device-path fallbacks must be observable (VERDICT r3 item 4): a
broken device kernel still produces correct output via the host
fallback, but logs a warning and bumps a process-wide counter that
bench.py snapshots into its detail block — a TPU-path regression can
never again silently turn a 30x path into host speed."""

import logging

import numpy as np
import pytest

from libultrahdr_dev_tpu.jpeg import codec
from libultrahdr_dev_tpu.utils import counters


@pytest.fixture(autouse=True)
def _fresh_counters():
    counters.reset()
    yield
    counters.reset()


def _planes(h=96, w=144, seed=0):
    rng = np.random.default_rng(seed)
    return {"y": rng.integers(0, 256, (h, w), np.uint8),
            "u": rng.integers(0, 256, (h // 2, w // 2), np.uint8),
            "v": rng.integers(0, 256, (h // 2, w // 2), np.uint8)}


class TestEncodeFallback:
    def test_broken_device_kernel_warns_and_counts(self, monkeypatch,
                                                   caplog):
        from libultrahdr_dev_tpu.jpeg import device_entropy as de

        planes = _planes(seed=1)
        monkeypatch.setattr(codec, "_DEVICE_CODEC_ON_CPU", True)
        monkeypatch.setattr(codec, "_DEVICE_ENCODE_MIN_PIXELS", 0)
        host = codec.encode_jpeg(planes, quality=87, restart_interval=6)

        def boom(*a, **k):
            raise RuntimeError("deliberately broken device kernel")

        monkeypatch.setattr(de, "_rst_kernel_ycbcr", boom)
        with caplog.at_level(logging.WARNING, logger="uhdr"):
            out = codec.encode_jpeg(planes, quality=87,
                                    restart_interval=6)
        assert out == host  # output correct via host fallback
        assert counters.snapshot().get(
            "device_rst_entropy_fallback", 0) >= 1
        assert any("device RST entropy" in r.message
                   for r in caplog.records)


class TestDecodeFallback:
    def test_broken_device_decode_warns_and_counts(self, monkeypatch,
                                                   caplog):
        from libultrahdr_dev_tpu.jpeg import device_decode as dd

        blob = codec.encode_jpeg(_planes(seed=2), quality=85,
                                 restart_interval=5)
        host = codec.decode_jpeg(blob)
        monkeypatch.setattr(codec, "_DEVICE_CODEC_ON_CPU", True)
        monkeypatch.setattr(codec, "_DEVICE_DECODE_MIN_PIXELS", 0)

        def boom(*a, **k):
            raise RuntimeError("deliberately broken device decode")

        monkeypatch.setattr(dd, "decode_jpeg_device", boom)
        with caplog.at_level(logging.WARNING, logger="uhdr"):
            out = codec.decode_jpeg(blob)
        for a, b in zip(out.planes, host.planes):
            assert np.array_equal(a, b)
        assert counters.snapshot().get("device_decode_fallback", 0) >= 1
        assert any("device JPEG decode" in r.message
                   for r in caplog.records)


class TestRiceReadbackFallback:
    def test_rice_raise_falls_back_to_fine_width(self, monkeypatch,
                                                 caplog):
        import jax

        from libultrahdr_dev_tpu.parallel import packio, sharding

        rng = np.random.default_rng(3)
        raw = (rng.integers(0, 1 << 30, (2, 16, 64), np.uint32)
               | np.uint32(0xC0000000))
        dev = jax.device_put(raw)

        def boom(*a, **k):
            raise RuntimeError("deliberately broken readback pack")

        monkeypatch.setattr(packio, "fetch_rgba1010102_auto", boom)
        stats = {}
        with caplog.at_level(logging.WARNING, logger="uhdr"):
            out = sharding.fetch_1010102_packed(dev, stats)
        assert np.array_equal(out, raw)
        assert stats["d2h_pack"] in ("rct-seg", "raw")
        assert counters.snapshot().get("rice_readback_fallback", 0) >= 1
        assert any("rice readback" in r.message
                   for r in caplog.records)
