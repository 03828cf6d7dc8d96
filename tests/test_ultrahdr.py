"""Converter-session flow tests, mirroring the reference's
ultrahdr_test.cpp testFlow1..7 coverage (JPEG_R -> JPEG, raw -> JPEG_R
with effects, etc.)."""

import numpy as np
import pytest

from libultrahdr_dev_tpu.jpegr import JpegR
from libultrahdr_dev_tpu.ops import editor
from libultrahdr_dev_tpu.types import (ColorGamut, ColorTransfer,
                                       OutputFormat, PixelFormat, RawImage,
                                       UhdrError)
from libultrahdr_dev_tpu.ultrahdr import UltraHdr, UltraHdrConfig, \
    sniff_format


def p010(h=64, w=96):
    rng = np.random.default_rng(2)
    y = (rng.integers(64, 940, (h, w)).astype(np.uint16)) << 6
    uv = np.full((h // 2, w), 512 << 6, np.uint16)
    return RawImage(fmt=PixelFormat.P010, width=w, height=h,
                    gamut=ColorGamut.BT2100, transfer=ColorTransfer.HLG,
                    planes={"y": y, "uv": uv})


def make_jpegr():
    return JpegR().encode_api0(p010(), ColorTransfer.HLG, quality=95)


class TestSniff:
    def test_jpeg_r(self):
        assert sniff_format(make_jpegr()) == "jpeg_r"

    def test_plain_jpeg(self):
        from libultrahdr_dev_tpu.jpeg import codec
        blob = codec.encode_jpeg({"y": np.zeros((16, 16), np.uint8)}, 90)
        assert sniff_format(blob) == "jpeg"

    def test_heif_brands(self):
        assert sniff_format(b"\x00\x00\x00\x18ftypheic" + b"\x00" * 8) == "heic"
        assert sniff_format(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 8) == "avif"
        assert sniff_format(b"garbage") == "unknown"


class TestFlows:
    def test_flow_jpegr_to_jpeg(self):
        """testFlow1: JPEG_R in -> plain JPEG out (base passthrough)."""
        u = UltraHdr().add_image(make_jpegr())
        out = u.convert(UltraHdrConfig(output_codec="jpeg"))
        assert sniff_format(out) == "jpeg"

    def test_flow_yuv420_to_jpeg(self):
        """testFlow2: raw SDR -> JPEG."""
        u = UltraHdr()
        u.add_raw(RawImage(
            fmt=PixelFormat.YUV420, width=32, height=32,
            gamut=ColorGamut.BT709,
            planes={"y": np.full((32, 32), 100, np.uint8),
                    "u": np.full((16, 16), 128, np.uint8),
                    "v": np.full((16, 16), 128, np.uint8)}))
        out = u.convert(UltraHdrConfig(output_codec="jpeg", quality=90))
        assert sniff_format(out) == "jpeg"

    def test_flow_p010_to_jpegr_with_effects(self):
        """testFlow3: P010 -> JPEG_R with mirror + rotate."""
        u = UltraHdr().add_raw(p010())
        cfg = UltraHdrConfig(output_codec="jpeg_r",
                             transfer=ColorTransfer.HLG,
                             effects=[editor.MirrorEffect("horizontal"),
                                      editor.RotateEffect(90)])
        out = u.convert(cfg)
        assert sniff_format(out) == "jpeg_r"
        info = JpegR().get_info(out)
        # 90-degree rotation swaps dims.
        assert (info.width, info.height) == (64, 96)
        assert (info.gainmap_width, info.gainmap_height) == (16, 24)

    def test_flow_jpegr_reencode_with_effects(self):
        """JPEG_R in -> JPEG_R out with a crop."""
        u = UltraHdr().add_image(make_jpegr())
        cfg = UltraHdrConfig(output_codec="jpeg_r",
                             effects=[editor.CropEffect(0, 48, 0, 32)])
        out = u.convert(cfg)
        info = JpegR().get_info(out)
        assert (info.width, info.height) == (48, 32)
        assert (info.gainmap_width, info.gainmap_height) == (12, 8)

    def test_flow_jpegr_passthrough_remux(self):
        """JPEG_R in, no effects -> API-4 remux preserving streams."""
        blob = make_jpegr()
        u = UltraHdr().add_image(blob)
        out = u.convert(UltraHdrConfig(output_codec="jpeg_r"))
        res = JpegR().decode(out, OutputFormat.HDR_LINEAR, 4.9)
        assert res.width == 96

    def test_flow_p010_to_raw_hdr(self):
        u = UltraHdr().add_raw(p010())
        img = u.convert_to_raw(UltraHdrConfig(
            output_format=OutputFormat.HDR_LINEAR, max_display_boost=4.9))
        assert img.fmt == PixelFormat.RGBA_F16

    def test_heif_rejected(self):
        with pytest.raises(UhdrError):
            UltraHdr().add_image(b"\x00\x00\x00\x18ftypheic" + b"\x00" * 64)
        u = UltraHdr().add_raw(p010())
        with pytest.raises(UhdrError):
            u.convert(UltraHdrConfig(output_codec="heic_r"))

    def test_insufficient_inputs(self):
        with pytest.raises(UhdrError):
            UltraHdr().convert(UltraHdrConfig(output_codec="jpeg_r"))
