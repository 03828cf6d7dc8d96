"""Property/fuzz tests mirroring the reference's two libFuzzer targets
(/root/reference/fuzzer/ultrahdr_dec_fuzzer.cpp: arbitrary bytes must
never crash probe/decode; /root/reference/fuzzer/ultrahdr_enc_fuzzer.cpp:
random valid dims/gamut/TF/quality must encode+decode), as seeded
deterministic sweeps."""

import numpy as np
import pytest

from libultrahdr_dev_tpu.container import mux, xmp, jfif, icc
from libultrahdr_dev_tpu.jpeg import codec
from libultrahdr_dev_tpu.jpegr import JpegR
from libultrahdr_dev_tpu.types import (ColorGamut, ColorTransfer,
                                       OutputFormat, PixelFormat, RawImage,
                                       UhdrError)


class TestDecodeFuzz:
    """Arbitrary bytes -> parser/probe/decode must raise UhdrError (or
    return cleanly), never crash or hang."""

    def _poke(self, data: bytes):
        assert mux.is_uhdr_image(data) in (True, False)
        jr = JpegR()
        for fn in (lambda: jr.get_info(data),
                   lambda: jr.decode(data, OutputFormat.HDR_LINEAR, 4.0),
                   lambda: codec.decode_jpeg(data)):
            try:
                fn()
            except UhdrError:
                pass

    def test_random_bytes(self):
        rng = np.random.default_rng(0)
        for size in (0, 1, 2, 16, 256, 4096):
            for _ in range(8):
                self._poke(rng.integers(0, 256, size,
                                        dtype=np.uint8).tobytes())

    def test_jpeg_prefixed_garbage(self):
        rng = np.random.default_rng(1)
        for _ in range(16):
            body = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
            self._poke(b"\xff\xd8" + body)
            self._poke(b"\xff\xd8\xff\xe1" + body)

    def test_truncated_real_file(self):
        blob = JpegR().encode_api0(_p010(32, 32), ColorTransfer.HLG)
        for cut in (2, 10, len(blob) // 4, len(blob) // 2, len(blob) - 5):
            self._poke(blob[:cut])

    def test_bitflipped_real_file(self):
        blob = bytearray(JpegR().encode_api0(_p010(32, 32),
                                             ColorTransfer.HLG))
        rng = np.random.default_rng(2)
        for _ in range(12):
            mutated = bytearray(blob)
            for pos in rng.integers(2, len(blob), 4):
                mutated[pos] ^= 1 << int(rng.integers(0, 8))
            self._poke(bytes(mutated))

    def test_xmp_fuzz(self):
        rng = np.random.default_rng(3)
        for _ in range(16):
            payload = (xmp.XMP_NAMESPACE.encode() + b"\x00"
                       + rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
            try:
                xmp.get_metadata_from_xmp(payload)
            except UhdrError:
                pass

    def test_icc_fuzz(self):
        rng = np.random.default_rng(4)
        for _ in range(16):
            data = (icc.ICC_IDENTIFIER
                    + rng.integers(0, 256, 200, dtype=np.uint8).tobytes())
            assert icc.read_icc_color_gamut(data) in (
                "bt709", "p3", "bt2100", "unspecified")


def _p010(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return RawImage(
        fmt=PixelFormat.P010, width=w, height=h, gamut=ColorGamut.BT2100,
        transfer=ColorTransfer.HLG,
        planes={"y": (rng.integers(64, 940, (h, w)).astype(np.uint16)) << 6,
                "uv": (rng.integers(64, 960, (h // 2, w)).astype(
                    np.uint16)) << 6})


class TestEncodeFuzz:
    """Random valid configs must encode to decodable JPEG/R
    (enc fuzzer analog: dims within bounds, gamut/TF/quality sweeps)."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_config_roundtrip(self, seed):
        rng = np.random.default_rng(100 + seed)
        w = int(rng.integers(1, 12)) * 8
        h = int(rng.integers(1, 12)) * 8
        gamut = [ColorGamut.BT709, ColorGamut.P3,
                 ColorGamut.BT2100][int(rng.integers(0, 3))]
        tf = [ColorTransfer.HLG, ColorTransfer.PQ,
              ColorTransfer.LINEAR][int(rng.integers(0, 3))]
        quality = int(rng.integers(10, 101))
        img = _p010(h, w, seed)
        img.gamut = gamut
        blob = JpegR().encode_api0(img, tf, quality=quality)
        res = JpegR().decode(blob, OutputFormat.HDR_LINEAR, 4.0)
        assert (res.width, res.height) == (w, h)

    def test_odd_dims_rejected(self):
        img = _p010(32, 32)
        img.width = 31
        with pytest.raises(UhdrError):
            JpegR().encode_api0(img, ColorTransfer.HLG)

    def test_tiny_and_bounds(self):
        blob = JpegR().encode_api0(_p010(8, 8), ColorTransfer.HLG)
        res = JpegR().decode(blob, OutputFormat.HDR_LINEAR, 2.0)
        assert (res.width, res.height) == (8, 8)
        img = _p010(8, 8)
        img.width = 9000  # beyond kMaxWidth
        with pytest.raises(UhdrError):
            JpegR().encode_api0(img, ColorTransfer.HLG)
