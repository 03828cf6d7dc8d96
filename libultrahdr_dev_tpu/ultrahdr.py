"""UltraHdr universal converter session.

Re-implements the dev fork's experimental converter
(/root/reference/lib/include/ultrahdr/ultrahdr.h:243-331,
 /root/reference/lib/src/ultrahdr.cpp:578-1505): a session object that
ingests images (add_image sniffs JPEG vs JPEG/R; raw planes via
add_raw), lazily tone-maps / decodes as needed, and converts to a
requested output codec/format with an optional effect chain applied to
the SDR + gain map before encode (ultrahdr.cpp:997-1009).

HEIC/AVIF input/output runs through HeifR (gain-map container by
container/isobmff.py, coded images via the system libheif); when no
libheif is installed those paths raise UHDR_CODEC_UNSUPPORTED_FEATURE
like the reference does without its codec plugins.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .container import jfif, mux, xmp
from .jpeg import codec
from .jpegr import JpegR
from .ops import editor, gainmap as gm
from .types import (ColorGamut, ColorTransfer, GainMapMetadata,
                    OutputFormat, PixelFormat, RawImage, err)


def sniff_format(data: bytes) -> str:
    """JPEG / JPEG_R / HEIF container sniffing (ultrahdr.cpp:69-129)."""
    if len(data) >= 3 and data[0] == 0xFF and data[1] == 0xD8:
        return "jpeg_r" if mux.is_uhdr_image(data) else "jpeg"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand in (b"avif", b"avis"):
            return "avif"
        if brand in (b"heic", b"heix", b"heim", b"heis", b"mif1",
                     b"hevc", b"hevx", b"hevm", b"hevs", b"msf1"):
            return "heic"
    return "unknown"


@dataclass
class UltraHdrConfig:
    """ultrahdr_configuration (ultrahdr.h:222-241)."""

    # Output codec names map 1:1 onto ultrahdr_codec (ultrahdr.h:79-88):
    #   jpeg | jpeg_r | heic | heic_r | heic_10bit | avif | avif_r |
    #   avif_10bit   (raw pixels go via convert_to_raw()).
    # "heic"/"avif" are the reference's plain 8-bit SDR renditions
    # (ultrahdr.cpp:1181-1206), NOT the 10-bit HDR outputs.
    output_codec: str = "jpeg_r"
    quality: int = 95
    gamut: ColorGamut = ColorGamut.BT709
    transfer: ColorTransfer = ColorTransfer.HLG
    effects: list = field(default_factory=list)
    max_display_boost: float = float("inf")
    output_format: OutputFormat = OutputFormat.HDR_LINEAR
    # For convert_to_raw: explicit raw output layout (P010 / YUV420
    # passthrough outputs, ultrahdr.cpp:1296-1441); None derives the
    # layout from output_format.
    output_pixel_format: PixelFormat | None = None


def _rgb10_to_bt2020_yuv420(planes):
    """(3,H,W) 10-bit OETF-encoded RGB -> narrow-range BT.2020
    YCbCr 4:2:0 10-bit ((H,W) y, (H/2,W/2) cb/cr). Narrow-range
    constants match the P010 conventions the ingest side assumes
    (gainmapmath.cpp:583-601: (y-64)/876, (uv-512)/896)."""
    r, g, b = (planes.astype(np.float32) / 1023.0)
    y = 0.2627 * r + 0.6780 * g + 0.0593 * b
    u = (b - y) / 1.8814
    v = (r - y) / 1.4746
    h, w = y.shape
    if h % 2 or w % 2:  # pad to even for the 2x2 chroma mean
        y = np.pad(y, ((0, h % 2), (0, w % 2)), mode="edge")
        u = np.pad(u, ((0, h % 2), (0, w % 2)), mode="edge")
        v = np.pad(v, ((0, h % 2), (0, w % 2)), mode="edge")
    yq = np.clip(np.round(64 + 876 * y[:h, :w]), 0, 1023)
    uq = np.clip(np.round(
        512 + 896 * u.reshape(-1, 2, u.shape[1] // 2, 2).mean((1, 3))),
        0, 1023)
    vq = np.clip(np.round(
        512 + 896 * v.reshape(-1, 2, v.shape[1] // 2, 2).mean((1, 3))),
        0, 1023)
    return (yq.astype(np.uint16), uq.astype(np.uint16),
            vq.astype(np.uint16))


class UltraHdr:
    """Converter session: add_image / add_raw, then convert()."""

    def __init__(self):
        self.sdr_jpeg: bytes | None = None
        self.sdr_raw: RawImage | None = None
        self.hdr_raw: RawImage | None = None
        self.gainmap_jpeg: bytes | None = None
        self.gainmap_raw: np.ndarray | None = None
        self.metadata: GainMapMetadata | None = None
        self.exif: bytes | None = None

    # ------------------------------------------------------------------
    # Ingest (ultrahdr.cpp:578-808 addImage)
    # ------------------------------------------------------------------

    def add_image(self, data: bytes):
        kind = sniff_format(data)
        if kind == "jpeg":
            self.sdr_jpeg = data
            info = jfif.parse_jpeg_info(data)
            if info.exif is not None:
                self.exif = info.exif
            return self
        if kind == "jpeg_r":
            primary, gmap = mux.extract_primary_and_gainmap(data)
            self.sdr_jpeg = primary
            self.gainmap_jpeg = gmap
            ginfo = jfif.parse_jpeg_info(gmap)
            if ginfo.xmp is not None:
                self.metadata = xmp.get_metadata_from_xmp(ginfo.xmp)
            gdec = codec.decode_jpeg(gmap)
            self.gainmap_raw = gdec.planes[0]
            pinfo = jfif.parse_jpeg_info(primary)
            if pinfo.exif is not None:
                self.exif = pinfo.exif
            return self
        if kind in ("heic", "avif"):
            return self._add_heif(data)
        raise err("UHDR_CODEC_INVALID_PARAM", "unrecognized image format")

    def _add_heif(self, data: bytes):
        """HEIF/AVIF ingest (ultrahdr.cpp:631-743): gain-map containers
        populate SDR + gain map + metadata; plain HEIFs populate the
        SDR rendition."""
        from .container import isobmff as iso, libheif as lh
        from .heifr import HeifR

        hp = iso.parse_heif(data)
        tmaps = [i for i, it in hp.items.items()
                 if it.item_type == "tmap"]
        if tmaps:
            refs = hp.refs.get(("dimg", tmaps[0]))
            if not refs or len(refs) < 2:
                raise err("UHDR_CODEC_ERROR", "tmap item lacks dimg refs")
            root_type = hp.items[refs[0]].item_type
            if root_type == "grid":
                kids = hp.refs.get(("dimg", refs[0]), [])
                root_type = (hp.items[kids[0]].item_type if kids
                             else "hvc1")
            codec = "avif" if root_type == "av01" else "heic"
            res = HeifR(codec).decode(data, OutputFormat.SDR)
            # The decode result carries the base YUV planes — no
            # second HEVC/AV1 decode of the primary.
            y8, u8, v8 = res.base_yuv
            self.sdr_raw = RawImage(
                fmt=PixelFormat.YUV420, width=y8.shape[1],
                height=y8.shape[0], gamut=ColorGamut.UNSPECIFIED,
                transfer=ColorTransfer.SRGB,
                planes={"y": y8, "u": u8, "v": v8})
            self.gainmap_raw = np.asarray(res.gainmap)
            self.metadata = res.metadata
            if res.exif is not None:
                self.exif = res.exif
            return self
        # Plain HEIF: 8-bit primary is the SDR rendition, a 10-bit one
        # populates the raw HDR slot as P010 (ultrahdr.cpp:661-692:
        # luma_bits_per_pixel 10 -> hdr_raw, 8 -> sdr_raw).
        if not lh.available():
            raise err("UHDR_CODEC_UNSUPPORTED_FEATURE",
                      "heif input requires the libheif shared library")
        planes, depth, heif_exif = lh.decode_primary_full(
            data, monochrome=False)
        if heif_exif is not None:
            self.exif = heif_exif
        y, u, v = planes
        h, w = y.shape
        if depth > 8:
            shift = 16 - depth  # P010: 10-bit MSB-aligned u16
            uv = np.empty((u.shape[0], u.shape[1] * 2), np.uint16)
            uv[:, 0::2] = u.astype(np.uint16) << shift
            uv[:, 1::2] = v.astype(np.uint16) << shift
            self.hdr_raw = RawImage(
                fmt=PixelFormat.P010, width=w, height=h,
                gamut=ColorGamut.BT2100,
                transfer=ColorTransfer.UNSPECIFIED,
                planes={"y": y.astype(np.uint16) << shift, "uv": uv})
            return self
        self.sdr_raw = RawImage(
            fmt=PixelFormat.YUV420, width=w, height=h,
            gamut=ColorGamut.UNSPECIFIED, transfer=ColorTransfer.SRGB,
            planes={"y": y, "u": u, "v": v})
        return self

    def add_raw(self, img: RawImage):
        if img.fmt == PixelFormat.P010:
            self.hdr_raw = img
        elif img.fmt == PixelFormat.YUV420:
            self.sdr_raw = img
        else:
            raise err("UHDR_CODEC_INVALID_PARAM",
                      f"unsupported raw format {img.fmt}")
        return self

    def add_gainmap(self, gainmap_u8: np.ndarray,
                    metadata: GainMapMetadata):
        self.gainmap_raw = np.asarray(gainmap_u8)
        self.metadata = metadata
        return self

    # ------------------------------------------------------------------
    # Lazy derivations (ultrahdr.cpp:1443-1505)
    # ------------------------------------------------------------------

    def _maybe_decode_jpeg_sdr(self):
        if self.sdr_raw is None and self.sdr_jpeg is not None:
            dec = codec.decode_jpeg(self.sdr_jpeg)
            if dec.ncomp != 3:
                raise err("UHDR_CODEC_ERROR", "SDR JPEG is not YCbCr")
            gamut = ColorGamut.UNSPECIFIED
            if dec.icc is not None:
                from .container import icc as icc_mod
                g = icc_mod.read_icc_color_gamut(dec.icc)
                if g != "unspecified":
                    gamut = ColorGamut(g)
            self.sdr_raw = RawImage(
                fmt=PixelFormat.YUV420, width=dec.width, height=dec.height,
                gamut=gamut, transfer=ColorTransfer.SRGB,
                planes={"y": dec.planes[0], "u": dec.planes[1],
                        "v": dec.planes[2]})

    def _maybe_tonemap_raw_hdr(self):
        if self.sdr_raw is None and self.hdr_raw is not None:
            y8, u8, v8 = gm.tonemap_p010(self.hdr_raw.planes["y"],
                                         self.hdr_raw.planes["uv"])
            self.sdr_raw = RawImage(
                fmt=PixelFormat.YUV420, width=self.hdr_raw.width,
                height=self.hdr_raw.height, gamut=self.hdr_raw.gamut,
                transfer=ColorTransfer.SRGB,
                planes={"y": np.asarray(y8), "u": np.asarray(u8),
                        "v": np.asarray(v8)})

    def _gainmap_as_image(self) -> RawImage:
        g = self.gainmap_raw
        return RawImage(fmt=PixelFormat.MONOCHROME, width=g.shape[1],
                        height=g.shape[0], planes={"y": g})

    # ------------------------------------------------------------------
    # Convert (ultrahdr.cpp:866-1441)
    # ------------------------------------------------------------------

    def convert(self, config: UltraHdrConfig) -> bytes:
        if config.output_codec == "jpeg":
            return self._convert_to_jpeg(config)
        if config.output_codec == "jpeg_r":
            return self._convert_to_jpegr(config)
        if config.output_codec in ("heic_r", "avif_r"):
            return self._convert_to_heifr(
                config, config.output_codec[:4])
        if config.output_codec in ("heic", "avif"):
            return self._convert_to_heif_sdr(config,
                                             config.output_codec)
        if config.output_codec in ("heic_10bit", "avif_10bit"):
            return self._convert_to_heif10(
                config, config.output_codec.split("_")[0])
        raise err("UHDR_CODEC_INVALID_PARAM",
                  f"unknown output codec {config.output_codec}")

    def _convert_to_heif_sdr(self, config: UltraHdrConfig,
                             codec: str) -> bytes:
        """Plain 8-bit SDR HEIC/AVIF output — ULTRAHDR_CODEC_HEIC/AVIF
        (ultrahdr.cpp:1181-1206): tone map / decode the SDR rendition,
        apply effects, encode heif-only with EXIF attached
        (heifr.cpp:271-279)."""
        from .heifr import HeifR

        self._maybe_tonemap_raw_hdr()
        self._maybe_decode_jpeg_sdr()
        if self.sdr_raw is None:
            raise err("UHDR_CODEC_INVALID_OPERATION",
                      "no SDR rendition available")
        sdr = editor.apply_effects(self.sdr_raw, config.effects)
        return HeifR(codec).encode_sdr(sdr, quality=config.quality,
                                       exif=self.exif)

    def _convert_to_heifr(self, config: UltraHdrConfig,
                          codec: str) -> bytes:
        """Gain-map HEIC/AVIF output (ultrahdr.cpp:1049-1180), same
        priority chain as jpeg_r minus the compressed-passthrough
        cases."""
        from .heifr import HeifR

        hr = HeifR(codec)
        # Raw SDR + raw gain map + metadata (API-x), effects applied.
        if (self.sdr_raw is not None and self.gainmap_raw is not None
                and self.metadata is not None):
            sdr = editor.apply_effects(self.sdr_raw, config.effects)
            gmap = self._gainmap_as_image()
            if config.effects:
                scale = self.sdr_raw.width // gmap.width
                gmap = editor.apply_effects(
                    gmap, editor.scale_effects(config.effects, scale))
            return hr.encode_apix(sdr, gmap.planes["y"], self.metadata,
                                  quality=config.quality,
                                  exif=self.exif)
        if self.hdr_raw is not None and self.sdr_raw is not None:
            if not config.effects:
                return hr.encode_api1(self.hdr_raw, self.sdr_raw,
                                      config.transfer,
                                      quality=config.quality,
                                      exif=self.exif)
        if self.hdr_raw is not None and not config.effects:
            return hr.encode_api0(self.hdr_raw, config.transfer,
                                  quality=config.quality,
                                  exif=self.exif)
        if self.hdr_raw is not None or (
                self.sdr_jpeg is not None and self.gainmap_raw is not None
                and self.metadata is not None):
            # Effects (or decoded-JPEG source): generate/reuse the gain
            # map, apply chain, encode API-x.
            self._maybe_decode_jpeg_sdr()
            self._maybe_tonemap_raw_hdr()
            self._ensure_gainmap(config)
            sdr = editor.apply_effects(self.sdr_raw, config.effects)
            gmap = self._gainmap_as_image()
            if config.effects:
                scale = self.sdr_raw.width // gmap.width
                gmap = editor.apply_effects(
                    gmap, editor.scale_effects(config.effects, scale))
            return hr.encode_apix(sdr, gmap.planes["y"], self.metadata,
                                  quality=config.quality,
                                  exif=self.exif)
        raise err("UHDR_CODEC_INVALID_OPERATION",
                  f"insufficient inputs for {codec}_r conversion")

    def _convert_to_heif10(self, config: UltraHdrConfig,
                           codec: str) -> bytes:
        """10-bit HEIC/AVIF output: reconstruct HDR as 10-bit RGB
        planes and encode 4:4:4 10-bit with CICP signaling
        (ultrahdr.cpp:1207-1287)."""
        from .container import libheif as lh

        raw = self.convert_to_raw(UltraHdrConfig(
            output_format=(OutputFormat.HDR_HLG
                           if config.transfer == ColorTransfer.HLG
                           else OutputFormat.HDR_PQ),
            # carry the caller's color config: _ensure_gainmap reads
            # hdr_tf off the config it is given, and the inner
            # config's default (HLG) would silently mis-linearize PQ
            # input when the gain map has not been generated yet
            transfer=config.transfer,
            gamut=config.gamut,
            effects=config.effects,
            max_display_boost=config.max_display_boost))
        packed = np.asarray(raw.planes["rgba"])  # RGBA1010102 u32
        planes = np.stack([(packed >> s10) & 0x3FF
                           for s10 in (0, 10, 20)]).astype(np.uint16)
        if codec == "avif":
            # libheif's aom plugin here mis-selects AV1 profile 2 for
            # any 10-bit encode (libaom assertion -> process abort), so
            # 10-bit AVIF goes through libavif directly as BT.2020
            # narrow-range YCbCr 4:2:0 (AV1 Main profile).
            from .container import libavif as la
            return la.encode_yuv(
                _rgb10_to_bt2020_yuv420(planes), 10, config.quality,
                transfer=config.transfer.value, exif=self.exif)
        return lh.encode_rgb10(planes, codec, config.quality,
                               transfer=config.transfer.value,
                               exif=self.exif)

    def convert_to_raw(self, config: UltraHdrConfig) -> RawImage:
        """Raw-pixel outputs (ultrahdr.cpp:1296-1441), computed
        directly from the session's planes — no compress/decompress
        round trip. Effects are honored on every layout that carries
        pixel planes:

          P010          - HDR passthrough (requires a raw HDR input)
          YUV420        - SDR rendition + effects
          RGBA8888/SDR  - SDR rendition + effects, packed
          F16/1010102/10-bit planar - gain-map reconstruction on device
        """
        fmt = config.output_pixel_format
        if fmt == PixelFormat.P010:
            if self.hdr_raw is None:
                raise err("UHDR_CODEC_INVALID_OPERATION",
                          "no raw HDR input for P010 output")
            return self.hdr_raw
        if fmt == PixelFormat.YUV420:
            self._maybe_decode_jpeg_sdr()
            self._maybe_tonemap_raw_hdr()
            if self.sdr_raw is None:
                raise err("UHDR_CODEC_INVALID_OPERATION",
                          "no SDR rendition available")
            return editor.apply_effects(self.sdr_raw, config.effects)
        if (config.output_format == OutputFormat.SDR
                or fmt == PixelFormat.RGBA8888):
            self._maybe_decode_jpeg_sdr()
            self._maybe_tonemap_raw_hdr()
            if self.sdr_raw is None:
                raise err("UHDR_CODEC_INVALID_OPERATION",
                          "no SDR rendition available")
            img = editor.apply_effects(self.sdr_raw, config.effects)
            rgba = gm.yuv420_to_rgba8888(
                np.asarray(img.planes["y"]), np.asarray(img.planes["u"]),
                np.asarray(img.planes["v"]))
            return RawImage(fmt=PixelFormat.RGBA8888, width=img.width,
                            height=img.height, gamut=img.gamut,
                            planes={"rgba": rgba})

        # HDR reconstruction: base + gain map through the device apply
        # kernel at the requested output format.
        self._maybe_decode_jpeg_sdr()
        self._maybe_tonemap_raw_hdr()
        if self.sdr_raw is None:
            raise err("UHDR_CODEC_INVALID_OPERATION",
                      "no SDR rendition available")
        self._ensure_gainmap(config)
        sdr = editor.apply_effects(self.sdr_raw, config.effects)
        gmap = self._gainmap_as_image()
        if config.effects:
            scale = self.sdr_raw.width // gmap.width
            gmap = editor.apply_effects(
                gmap, editor.scale_effects(config.effects, scale))
        out_fmt = config.output_format
        if fmt == PixelFormat.RGB_10BIT_PLANAR:
            out_fmt = OutputFormat.HDR_LINEAR_RGB_10BIT
        out = gm.apply_gainmap(
            np.asarray(sdr.planes["y"]), np.asarray(sdr.planes["u"]),
            np.asarray(sdr.planes["v"]), np.asarray(gmap.planes["y"]),
            self.metadata, out_fmt.value, config.max_display_boost)
        from .jpegr import _OUT_PIXEL_FMT, _OUT_TRANSFER

        return RawImage(fmt=_OUT_PIXEL_FMT[out_fmt], width=sdr.width,
                        height=sdr.height, gamut=sdr.gamut,
                        transfer=_OUT_TRANSFER[out_fmt],
                        planes={"rgba": out})

    def _convert_to_jpeg(self, config: UltraHdrConfig) -> bytes:
        # Pass through when no effects and a JPEG already exists
        # (ultrahdr.cpp:872-881).
        if self.sdr_jpeg is not None and not config.effects:
            return self.sdr_jpeg
        self._maybe_decode_jpeg_sdr()
        self._maybe_tonemap_raw_hdr()
        if self.sdr_raw is None:
            raise err("UHDR_CODEC_INVALID_OPERATION",
                      "no SDR rendition available")
        img = editor.apply_effects(self.sdr_raw, config.effects)
        icc = None
        if img.gamut in (ColorGamut.BT709, ColorGamut.P3,
                         ColorGamut.BT2100):
            from .container import icc as icc_mod
            icc = icc_mod.write_icc_profile("srgb", img.gamut.value)
        return codec.encode_jpeg(
            {"y": img.planes["y"], "u": img.planes["u"],
             "v": img.planes["v"]}, quality=config.quality, icc=icc)

    def _convert_to_jpegr(self, config: UltraHdrConfig) -> bytes:
        jr = JpegR()
        # Priority chain (ultrahdr.cpp:919-1047):
        # API-4: compressed base + compressed gain map, no effects.
        if (self.gainmap_jpeg is not None and self.sdr_jpeg is not None
                and self.metadata is not None and not config.effects):
            return jr.encode_api4(self.sdr_jpeg, self.gainmap_jpeg,
                                  self.metadata, exif=None)
        # API-x: raw SDR + raw gain map + metadata.
        if (self.sdr_raw is not None and self.gainmap_raw is not None
                and self.metadata is not None):
            sdr = editor.apply_effects(self.sdr_raw, config.effects)
            gmap = self._gainmap_as_image()
            if config.effects:
                scale = self.sdr_raw.width // gmap.width
                gmap = editor.apply_effects(
                    gmap, editor.scale_effects(config.effects, scale))
            return jr.encode_apix(sdr, gmap.planes["y"], self.metadata,
                                  quality=config.quality, exif=self.exif)
        # API-2: raw HDR + raw SDR + compressed SDR.
        if (self.hdr_raw is not None and self.sdr_raw is not None
                and self.sdr_jpeg is not None and not config.effects):
            return jr.encode_api2(self.hdr_raw, self.sdr_raw,
                                  self.sdr_jpeg, config.transfer)
        # API-3: raw HDR + compressed SDR.
        if (self.hdr_raw is not None and self.sdr_jpeg is not None
                and self.sdr_raw is None and not config.effects):
            return jr.encode_api3(self.hdr_raw, self.sdr_jpeg,
                                  config.transfer)
        # API-1: raw HDR + raw SDR.
        if self.hdr_raw is not None and self.sdr_raw is not None:
            if not config.effects:
                return jr.encode_api1(self.hdr_raw, self.sdr_raw,
                                      config.transfer,
                                      quality=config.quality,
                                      exif=self.exif)
            return self._encode_with_effects(jr, config)
        # API-0: raw HDR only.
        if self.hdr_raw is not None:
            if not config.effects:
                return jr.encode_api0(self.hdr_raw, config.transfer,
                                      quality=config.quality,
                                      exif=self.exif)
            self._maybe_tonemap_raw_hdr()
            return self._encode_with_effects(jr, config)
        # JPEG_R passthrough re-encode from decoded parts.
        if (self.sdr_jpeg is not None and self.gainmap_raw is not None
                and self.metadata is not None):
            self._maybe_decode_jpeg_sdr()
            return self._encode_with_effects(jr, config)
        raise err("UHDR_CODEC_INVALID_OPERATION",
                  "insufficient inputs for jpeg_r conversion")

    def _ensure_gainmap(self, config: UltraHdrConfig):
        """Generate the gain map from the raw pair when the session
        doesn't carry one yet (ultrahdr.cpp:997-1009)."""
        if self.gainmap_raw is not None and self.metadata is not None:
            return
        if self.hdr_raw is None or self.sdr_raw is None:
            raise err("UHDR_CODEC_INVALID_OPERATION",
                      "cannot generate gain map without HDR input")
        gmap, md = gm.generate_gainmap(
            np.asarray(self.sdr_raw.planes["y"]),
            np.asarray(self.sdr_raw.planes["u"]),
            np.asarray(self.sdr_raw.planes["v"]),
            self.hdr_raw.planes["y"], self.hdr_raw.planes["uv"],
            sdr_gamut=self.sdr_raw.gamut.value,
            hdr_gamut=self.hdr_raw.gamut.value,
            hdr_tf=config.transfer.value)
        self.gainmap_raw = np.asarray(gmap)
        self.metadata = md

    def _encode_with_effects(self, jr: JpegR,
                             config: UltraHdrConfig) -> bytes:
        """Generate (or reuse) the gain map, apply the effect chain to
        SDR + gain map, then encode via API-x
        (ultrahdr.cpp:997-1009, 1124-1180)."""
        self._maybe_tonemap_raw_hdr()
        self._ensure_gainmap(config)
        sdr = editor.apply_effects(self.sdr_raw, config.effects)
        gmap_img = self._gainmap_as_image()
        if config.effects:
            scale = self.sdr_raw.width // gmap_img.width
            gmap_img = editor.apply_effects(
                gmap_img, editor.scale_effects(config.effects, scale))
        return jr.encode_apix(sdr, gmap_img.planes["y"], self.metadata,
                              quality=config.quality, exif=self.exif)
