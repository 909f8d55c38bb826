"""GLB scene export (vggsfm_tpu/io/glb.py) structural tests."""

import json
import struct

import numpy as np

from vggsfm_tpu.io.glb import reconstruction_to_glb, write_glb_scene


def _parse_glb(path):
    raw = open(path, "rb").read()
    magic, version, total = struct.unpack("<III", raw[:12])
    assert magic == 0x46546C67 and version == 2
    assert total == len(raw)
    jlen, jtype = struct.unpack("<II", raw[12:20])
    assert jtype == 0x4E4F534A
    gltf = json.loads(raw[20:20 + jlen])
    blen, btype = struct.unpack("<II", raw[20 + jlen:28 + jlen])
    assert btype == 0x004E4942
    binchunk = raw[28 + jlen:28 + jlen + blen]
    return gltf, binchunk


class TestGLB:
    def test_point_cloud_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.uniform(size=(100, 3)).astype(np.float32)
        path = str(tmp_path / "cloud.glb")
        write_glb_scene(path, pts, colors=cols)
        gltf, binchunk = _parse_glb(path)
        prim = gltf["meshes"][0]["primitives"][0]
        assert prim["mode"] == 0  # POINTS
        acc = gltf["accessors"][prim["attributes"]["POSITION"]]
        assert acc["count"] == 100
        view = gltf["bufferViews"][acc["bufferView"]]
        got = np.frombuffer(
            binchunk[view["byteOffset"]:view["byteOffset"]
                     + view["byteLength"]], np.float32).reshape(-1, 3)
        np.testing.assert_allclose(got, pts)
        np.testing.assert_allclose(acc["min"], pts.min(0), rtol=1e-6)

    def test_cameras_add_line_primitive(self, rng, tmp_path):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        S = 3
        extr = np.tile(np.eye(3, 4, dtype=np.float64), (S, 1, 1))
        extr[:, 0, 3] = np.arange(S)
        intr = np.tile(np.array([[100.0, 0, 64], [0, 100, 64],
                                 [0, 0, 1]]), (S, 1, 1))
        path = str(tmp_path / "scene.glb")
        write_glb_scene(path, pts, extrinsics=extr, intrinsics=intr,
                        image_size=(128, 128))
        gltf, _ = _parse_glb(path)
        prims = gltf["meshes"][0]["primitives"]
        assert len(prims) == 2
        assert prims[1]["mode"] == 1  # LINES
        # 8 segments x 2 endpoints per camera
        acc = gltf["accessors"][prims[1]["attributes"]["POSITION"]]
        assert acc["count"] == S * 16

    def test_reconstruction_to_glb(self, rng, tmp_path):
        preds = {
            "points3d": rng.normal(size=(50, 3)).astype(np.float32),
            "valid_tracks": np.arange(50) % 2 == 0,
            "colors": rng.uniform(size=(50, 3)).astype(np.float32),
            "extrinsics": np.tile(np.eye(3, 4), (2, 1, 1)),
            "intrinsics": np.tile(np.array(
                [[50.0, 0, 32], [0, 50, 32], [0, 0, 1]]), (2, 1, 1)),
        }
        path = str(tmp_path / "rec.glb")
        reconstruction_to_glb(preds, path, image_size=(64, 64))
        gltf, _ = _parse_glb(path)
        acc = gltf["accessors"][
            gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
        assert acc["count"] == 25
