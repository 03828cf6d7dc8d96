"""Blockwise 8x8 DCT / IDCT + (de)quantization on TPU.

Replaces libjpeg's jdct (JDCT_ISLOW) used by the reference's
encoder/decoder wrappers (/root/reference/lib/src/jpegencoderhelper.cpp,
jpegdecoderhelper.cpp): a plane is reshaped into its 8x8 blocks and the
2-D DCT becomes two batched 8x8 matmuls (D @ X @ D^T), which XLA maps
onto the MXU; quantization fuses as elementwise VPU ops. Float DCT
(not the integer ISLOW approximation) — output feeds a standard JPEG
bitstream, bit-exactness with libjpeg's DCT is not required.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .tables import ZIGZAG


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: F = D @ x."""
    d = np.zeros((8, 8), np.float64)
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            d[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d


_D = _dct_matrix()
_ZIG = np.asarray(ZIGZAG)


def plane_to_blocks(plane):
    """(H, W) -> (H//8 * W//8, 8, 8) row-major block order."""
    h, w = plane.shape
    x = plane.reshape(h // 8, 8, w // 8, 8)
    return x.transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def blocks_to_plane(blocks, h: int, w: int):
    x = blocks.reshape(h // 8, w // 8, 8, 8)
    return x.transpose(0, 2, 1, 3).reshape(h, w)


@lru_cache(maxsize=None)
def _fdct_kernel(h: int, w: int):
    # numpy constants: building jnp arrays here would capture tracers
    # when the kernel is first constructed inside an outer trace.
    d = np.asarray(_D, np.float32)
    zig = _ZIG

    @jax.jit
    def kernel(plane_u8, qtable):
        # Level shift to [-128, 127] as T.81 prescribes.
        x = plane_u8.astype(jnp.float32) - 128.0
        blocks = plane_to_blocks(x)
        # Two batched 8x8 matmuls -> MXU. HIGHEST precision keeps the
        # f32 mantissa on TPU (default would downcast inputs to bf16,
        # visibly corrupting quantized coefficients).
        coefs = jnp.einsum("ux,nxy,vy->nuv", d, blocks, d,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        q = qtable.astype(jnp.float32).reshape(1, 8, 8)
        quant = jnp.round(coefs / q).astype(jnp.int16)
        # Emit in zigzag order for the entropy coder.
        return quant.reshape(-1, 64)[:, zig]

    return kernel


def fdct_quant(plane_u8, qtable_natural) -> jnp.ndarray:
    """u8 plane (dims multiple of 8) -> int16 (nblocks, 64) zigzag
    quantized coefficients."""
    h, w = plane_u8.shape
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    return _fdct_kernel(h, w)(jnp.asarray(plane_u8),
                              jnp.asarray(qtable_natural, jnp.int32))


@lru_cache(maxsize=None)
def _idct_kernel(h: int, w: int):
    d = np.asarray(_D, np.float32)
    inv_zig = np.argsort(_ZIG)

    @jax.jit
    def kernel(zig_coefs_i16, qtable):
        nat = zig_coefs_i16[:, inv_zig].astype(jnp.float32)
        q = qtable.astype(jnp.float32).reshape(1, 64)
        blocks = (nat * q).reshape(-1, 8, 8)
        # X = D^T F D: contract D over its first (frequency) axis.
        pix = jnp.einsum("ux,nuv,vy->nxy", d, blocks, d,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        pix = jnp.clip(jnp.round(pix + 128.0), 0, 255).astype(jnp.uint8)
        return blocks_to_plane(pix, h, w)

    return kernel


def dequant_idct(zig_coefs_i16, qtable_natural, h: int, w: int):
    """int16 (nblocks, 64) zigzag coefficients -> u8 plane (h, w),
    dims multiple of 8."""
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    return _idct_kernel(h, w)(jnp.asarray(zig_coefs_i16),
                              jnp.asarray(qtable_natural, jnp.int32))
