"""Lossless transfer pack (parallel/packio.py): exact roundtrips in
both directions, width bucketing, and the incompressible-content
fallbacks used by the bench/serving paths."""

import numpy as np
import pytest

from libultrahdr_dev_tpu.parallel import packio, sharding


def smooth_plane(h, w, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 1024, (h // 32 + 1, w // 32 + 1)).astype(
        np.float32)
    y = np.kron(small, np.ones((32, 32), np.float32))[:h, :w]
    return np.clip(y, 0, 1023).astype(np.uint16)


class TestPackPlane:
    @pytest.mark.parametrize("shape", [(64, 256), (96, 300),
                                       (320, 1024)])
    def test_host_pack_device_unpack_exact(self, shape):
        arr = smooth_plane(*shape)
        p = packio.pack_plane_host(arr)
        out = np.asarray(packio.unpack_plane_device(p))
        np.testing.assert_array_equal(out, arr)

    def test_noise_roundtrip_exact(self):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 1024, (64, 512)).astype(np.uint16)
        p = packio.pack_plane_host(arr)
        out = np.asarray(packio.unpack_plane_device(p))
        np.testing.assert_array_equal(out, arr)

    def test_smooth_compresses(self):
        arr = smooth_plane(320, 1024)
        p = packio.pack_plane_host(arr)
        assert p.nbytes() < arr.size * 10 / 8 / 2

    def test_device_pack_host_unpack_exact(self):
        import jax
        arr = smooth_plane(96, 512, seed=5)
        p = packio.pack_plane_device(jax.device_put(arr))
        np.testing.assert_array_equal(packio.unpack_plane_host(p), arr)

    def test_device_pack_max_bytes_bailout(self):
        import jax
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 1024, (64, 512)).astype(np.uint16)
        assert packio.pack_plane_device(jax.device_put(arr),
                                        max_bytes=100) is None

    def test_bad_height_rejected(self):
        with pytest.raises(ValueError):
            packio.pack_plane_host(np.zeros((33, 256), np.uint16))


class TestTransferPaths:
    def _batch(self, n=2, h=128, w=256):
        ys = np.stack([smooth_plane(h, w, seed=i) << 6
                       for i in range(n)]).astype(np.uint16)
        uvs = np.stack([smooth_plane(h // 2, w, seed=10 + i) << 6
                        for i in range(n)]).astype(np.uint16)
        return ys, uvs

    def test_upload_batch_reconstruction(self):
        # Large enough that the pow2 bucket-padding floor (256
        # segments/bucket) doesn't mask the compression win.
        ys, uvs = self._batch(n=2, h=256, w=1024)
        stats = {}
        ydev, uvdev, nb = sharding.upload_p010_batch(ys, uvs, stats)
        assert stats["h2d_pack"] == "seg"
        np.testing.assert_array_equal(np.asarray(ydev), ys)
        np.testing.assert_array_equal(np.asarray(uvdev), uvs)

    def test_upload_batch_noise_falls_back_dense(self):
        rng = np.random.default_rng(0)
        ys = (rng.integers(0, 1024, (1, 128, 256)).astype(np.uint16)
              << 6)
        uvs = (rng.integers(0, 1024, (1, 64, 256)).astype(np.uint16)
               << 6)
        stats = {}
        ydev, uvdev, nb = sharding.upload_p010_batch(ys, uvs, stats)
        assert stats["h2d_pack"] == "dense"
        np.testing.assert_array_equal(np.asarray(ydev), ys)

    def test_device_input_encode_matches_host_path(self):
        import jax
        ys, uvs = self._batch(n=1, h=128, w=256)
        mesh = sharding.default_mesh(jax.devices()[:1])
        ydev, uvdev, _ = sharding.upload_p010_batch(ys, uvs)
        a = sharding.batched_encode_api0(ys, uvs, mesh,
                                         device_input=(ydev, uvdev))
        b = sharding.batched_encode_api0(ys, uvs, mesh)
        assert a == b

    def test_fetch_1010102_packed_matches_raw(self):
        import jax
        ys, uvs = self._batch(n=1, h=128, w=256)
        mesh = sharding.default_mesh(jax.devices()[:1])
        blobs = sharding.batched_encode_api0(ys, uvs, mesh)
        out = sharding.batched_decode(blobs, "hdr_hlg", 1000 / 203,
                                      mesh)
        stats = {}
        packed = sharding.fetch_1010102_packed(out, stats)
        np.testing.assert_array_equal(packed, np.asarray(out))
        assert stats["d2h_bytes"] > 0
