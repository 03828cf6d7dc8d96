"""Editing effects: crop / mirror / rotate / resize on raw images.

Re-implements editorhelper (/root/reference/lib/src/editorhelper.cpp)
as jnp ops over RawImage planes, so effect chains fuse into the
surrounding decode->re-encode pipeline instead of the reference's
per-pixel copy loops. Supported on YUV420 and monochrome images, like
the reference (editorhelper.cpp:26-360).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..types import PixelFormat, RawImage, err


@dataclass
class CropEffect:
    """editorhelper.cpp:26-76: left/right/top/bottom in luma pixels
    (right/bottom exclusive); coordinates snap to even values for
    4:2:0 chroma alignment."""

    left: int
    right: int
    top: int
    bottom: int


@dataclass
class MirrorEffect:
    """editorhelper.cpp:78-170."""

    direction: str  # "horizontal" (left<->right) or "vertical"


@dataclass
class RotateEffect:
    """editorhelper.cpp:172-306; clockwise degrees in {90, 180, 270}."""

    degrees: int


@dataclass
class ResizeEffect:
    """editorhelper.cpp:308-360: nearest-neighbor to (width, height)."""

    width: int
    height: int


def _plane_names(img: RawImage):
    if img.fmt == PixelFormat.YUV420:
        return ["y", "u", "v"]
    if img.fmt == PixelFormat.MONOCHROME:
        return ["y"]
    raise err("UHDR_CODEC_UNSUPPORTED_FEATURE",
              f"effects unsupported for {img.fmt}")


def _apply_each(img: RawImage, fn_luma, fn_chroma) -> dict:
    out = {}
    for name in _plane_names(img):
        plane = jnp.asarray(img.planes[name])
        out[name] = fn_luma(plane) if name == "y" else fn_chroma(plane)
    return out


def crop(img: RawImage, e: CropEffect) -> RawImage:
    left, top = e.left & ~1, e.top & ~1
    right, bottom = e.right, e.bottom
    if not (0 <= left < right <= img.width
            and 0 <= top < bottom <= img.height):
        raise err("UHDR_CODEC_INVALID_PARAM",
                  f"invalid crop window {e}")
    w, h = right - left, bottom - top
    planes = _apply_each(
        img,
        lambda p: p[top:bottom, left:right],
        lambda p: p[top // 2:(top + h + 1) // 2,
                    left // 2:(left + w + 1) // 2])
    return RawImage(fmt=img.fmt, width=w, height=h, gamut=img.gamut,
                    transfer=img.transfer,
                    planes={k: np.asarray(v) for k, v in planes.items()})


def mirror(img: RawImage, e: MirrorEffect) -> RawImage:
    axis = 1 if e.direction == "horizontal" else 0
    planes = _apply_each(img, lambda p: jnp.flip(p, axis=axis),
                         lambda p: jnp.flip(p, axis=axis))
    return RawImage(fmt=img.fmt, width=img.width, height=img.height,
                    gamut=img.gamut, transfer=img.transfer,
                    planes={k: np.asarray(v) for k, v in planes.items()})


def rotate(img: RawImage, e: RotateEffect) -> RawImage:
    if e.degrees not in (90, 180, 270):
        raise err("UHDR_CODEC_INVALID_PARAM",
                  f"unsupported rotation {e.degrees}")
    # jnp.rot90 rotates counterclockwise; the reference rotates
    # clockwise (editorhelper.cpp:172-306).
    k = {90: 3, 180: 2, 270: 1}[e.degrees]
    fn = lambda p: jnp.rot90(p, k=k)
    planes = _apply_each(img, fn, fn)
    w, h = ((img.height, img.width) if e.degrees in (90, 270)
            else (img.width, img.height))
    return RawImage(fmt=img.fmt, width=w, height=h, gamut=img.gamut,
                    transfer=img.transfer,
                    planes={k2: np.asarray(v) for k2, v in planes.items()})


def resize(img: RawImage, e: ResizeEffect) -> RawImage:
    w, h = int(e.width), int(e.height)
    if w <= 0 or h <= 0 or w % 2 or h % 2:
        raise err("UHDR_CODEC_INVALID_PARAM", f"invalid resize {w}x{h}")

    def nearest(p, oh, ow):
        ih, iw = p.shape
        # index mapping i*ih/oh (truncating), as the reference does.
        rows = (jnp.arange(oh) * ih) // oh
        cols = (jnp.arange(ow) * iw) // ow
        return p[rows][:, cols]

    planes = _apply_each(img, lambda p: nearest(p, h, w),
                         lambda p: nearest(p, h // 2, w // 2))
    return RawImage(fmt=img.fmt, width=w, height=h, gamut=img.gamut,
                    transfer=img.transfer,
                    planes={k: np.asarray(v) for k, v in planes.items()})


def scale_effects(effects, factor: int):
    """Rescale pixel-coordinate effects (crop/resize) for a plane at
    1/factor resolution (the gain map), keeping orientation effects
    unchanged. The reference applies one effect vector to both the SDR
    and its quarter-res gain map (ultrahdr.cpp:997-1009); coordinates
    are scaled here so crops stay geometrically consistent."""
    out = []
    for e in effects:
        if isinstance(e, CropEffect):
            out.append(CropEffect(e.left // factor, e.right // factor,
                                  e.top // factor, e.bottom // factor))
        elif isinstance(e, ResizeEffect):
            out.append(ResizeEffect(max(e.width // factor, 1),
                                    max(e.height // factor, 1)))
        else:
            out.append(e)
    return out


def apply_effects(img: RawImage, effects) -> RawImage:
    """Chain effects in order (editorhelper.cpp:362-446 addEffects)."""
    for e in effects:
        if isinstance(e, CropEffect):
            img = crop(img, e)
        elif isinstance(e, MirrorEffect):
            img = mirror(img, e)
        elif isinstance(e, RotateEffect):
            img = rotate(img, e)
        elif isinstance(e, ResizeEffect):
            img = resize(img, e)
        else:
            raise err("UHDR_CODEC_INVALID_PARAM",
                      f"unknown effect {type(e).__name__}")
    return img
