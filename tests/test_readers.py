"""Dataset-format readers: COLMAP / NeRF-synthetic / Image layouts.

The fixtures synthesize the on-disk binary/json layouts from scratch
(COLMAP's documented binary format, NeRF's transforms json) and check the
readers recover cameras, splits, and init point clouds exactly."""

import json
import os
import struct

import numpy as np
import pytest

from splatter_a_video_tpu.data import readers
from splatter_a_video_tpu.models import camera as camera_lib


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr.astype(np.uint8))


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _rotmat2qvec(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    return np.array(
        [
            w,
            (R[2, 1] - R[1, 2]) / (4 * w),
            (R[0, 2] - R[2, 0]) / (4 * w),
            (R[1, 0] - R[0, 1]) / (4 * w),
        ]
    )


def _make_colmap_scene(root, num_images=10, w=64, h=48):
    """Write sparse/0/{cameras,images,points3D}.bin + images/*.png."""
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse)
    os.makedirs(os.path.join(root, "images"))

    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))  # PINHOLE
        f.write(struct.pack("<dddd", 60.0, 55.0, w / 2, h / 2))

    rng = np.random.RandomState(0)
    poses = []
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", num_images))
        for i in range(num_images):
            R = _rotmat(rng.randn(3), 0.3 * rng.rand())
            t = rng.randn(3) * 0.1
            q = _rotmat2qvec(R)
            poses.append((R, t))
            name = f"frame_{i:03d}.png"
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(name.encode() + b"\x00")
            n_pts = 3  # junk 2D-point table the reader must skip
            f.write(struct.pack("<Q", n_pts))
            f.write(struct.pack("<" + "ddq" * n_pts, *([1.0, 2.0, 7] * n_pts)))
            _write_png(
                os.path.join(root, "images", name), rng.randint(0, 255, (h, w, 3))
            )

    pts = rng.randn(20, 3)
    cols = rng.randint(0, 256, (20, 3))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i in range(len(pts)):
            f.write(struct.pack("<QdddBBBd", i, *pts[i], *cols[i], 0.5))
            track = [(1, 2), (3, 4)]
            f.write(struct.pack("<Q", len(track)))
            for a, b in track:
                f.write(struct.pack("<ii", a, b))
    return poses, pts, cols


class TestColmap:
    def test_roundtrip(self, tmp_path):
        root = str(tmp_path / "scene")
        os.makedirs(root)
        poses, pts, cols = _make_colmap_scene(root)

        train = readers.read_colmap_scene(root, "train")
        val = readers.read_colmap_scene(root, "val")
        # llffhold=8 on 10 frames: val = idx 0, 8
        assert len(val) == 2 and len(train) == 8
        names = [os.path.basename(p) for p in val.image_paths]
        assert names == ["frame_000.png", "frame_008.png"]

        # camera 1 of the sorted order = input frame 1 (train idx 0)
        R, t = poses[1]
        cam = train.cameras[0]
        np.testing.assert_allclose(cam.R, R, atol=1e-6)
        np.testing.assert_allclose(cam.t, t, atol=1e-6)
        assert cam.width == 64 and cam.height == 48
        np.testing.assert_allclose(cam.focal_x, 60.0, rtol=1e-6)
        np.testing.assert_allclose(cam.focal_y, 55.0, rtol=1e-6)

        np.testing.assert_allclose(train.pointcloud.positions, pts, atol=1e-6)
        np.testing.assert_allclose(
            train.pointcloud.colors, cols / 255.0, atol=1e-6
        )
        img = train.load_image(0)
        assert img.shape == (48, 64, 3) and img.dtype == np.float32
        assert train.camera_extent() > 0

    def test_ply_pointcloud_preferred(self, tmp_path):
        root = str(tmp_path / "scene")
        os.makedirs(root)
        _make_colmap_scene(root, num_images=2)
        # write a PLY with colors+normals; reader must prefer it over .bin
        n = 5
        rng = np.random.RandomState(1)
        pos = rng.randn(n, 3).astype(np.float32)
        col = rng.randint(0, 256, (n, 3)).astype(np.uint8)
        nrm = rng.randn(n, 3).astype(np.float32)
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            + "".join(f"property float {p}\n" for p in ("x", "y", "z"))
            + "".join(f"property float {p}\n" for p in ("nx", "ny", "nz"))
            + "".join(f"property uchar {p}\n" for p in ("red", "green", "blue"))
            + "end_header\n"
        )
        rec = np.dtype(
            [(p, "<f4") for p in ("x", "y", "z", "nx", "ny", "nz")]
            + [(p, "u1") for p in ("red", "green", "blue")]
        )
        table = np.zeros(n, rec)
        for i, p in enumerate(("x", "y", "z")):
            table[p] = pos[:, i]
            table[("nx", "ny", "nz")[i]] = nrm[:, i]
            table[("red", "green", "blue")[i]] = col[:, i]
        with open(os.path.join(root, "sparse", "0", "points3D.ply"), "wb") as f:
            f.write(header.encode() + table.tobytes())

        sc = readers.read_colmap_scene(root, "train")
        np.testing.assert_allclose(sc.pointcloud.positions, pos, atol=1e-6)
        np.testing.assert_allclose(sc.pointcloud.colors, col / 255.0, atol=1e-3)
        np.testing.assert_allclose(sc.pointcloud.normals, nrm, atol=1e-6)

    def test_unsupported_model_raises(self, tmp_path):
        root = str(tmp_path / "scene")
        os.makedirs(os.path.join(root, "sparse", "0"))
        os.makedirs(os.path.join(root, "images"))
        with open(os.path.join(root, "sparse", "0", "cameras.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 4, 8, 8))  # OPENCV
            f.write(struct.pack("<" + "d" * 8, *range(8)))
        with open(os.path.join(root, "sparse", "0", "images.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<idddddddi", 1, 1, 0, 0, 0, 0, 0, 0, 1))
            f.write(b"a.png\x00" + struct.pack("<Q", 0))
        with pytest.raises(ValueError, match="not supported"):
            readers.read_colmap_scene(root, "train")


class TestNerfSynthetic:
    def _make(self, root, split_frames):
        os.makedirs(os.path.join(root, "train"), exist_ok=True)
        rng = np.random.RandomState(2)
        for split, frames in split_frames.items():
            entries = []
            for i in range(frames):
                c2w = np.eye(4)
                c2w[:3, :3] = _rotmat(rng.randn(3), rng.rand())
                c2w[:3, 3] = rng.randn(3)
                rel = f"train/r_{split}_{i}"
                _write_png(
                    os.path.join(root, rel + ".png"),
                    rng.randint(0, 255, (32, 40, 4)),
                )
                entries.append(
                    {"file_path": rel, "transform_matrix": c2w.tolist()}
                )
            with open(
                os.path.join(root, f"transforms_{split}.json"), "w"
            ) as f:
                json.dump({"camera_angle_x": 0.8, "frames": entries}, f)

    def test_loads_and_flips_axes(self, tmp_path):
        root = str(tmp_path)
        self._make(root, {"train": 3, "test": 2})
        train = readers.read_nerf_synthetic_scene(root, "train")
        val = readers.read_nerf_synthetic_scene(root, "val")
        assert len(train) == 3 and len(val) == 2
        cam = train.cameras[0]
        assert cam.width == 40 and cam.height == 32
        assert abs(cam.fovx - 0.8) < 1e-9
        # extrinsic is a valid rotation (axis flip composed correctly)
        np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(cam.R), 1.0, atol=1e-5)
        # white-background alpha compositing
        img = train.load_image(0)
        assert img.shape == (32, 40, 3)
        assert train.backgrounds[0] == 1.0


class TestImageFormats:
    def test_image_reader(self, tmp_path):
        path = str(tmp_path / "pic.png")
        _write_png(path, np.random.RandomState(0).randint(0, 255, (24, 30, 3)))
        sc = readers.read_image_scene(path)
        assert len(sc) == 1
        cam = sc.cameras[0]
        assert (cam.width, cam.height) == (30, 24)
        # camera sits at z=2 looking back: center recovers the c2w translation
        np.testing.assert_allclose(cam.camera_center, [0, 0, 2.0], atol=1e-6)

    def test_image_depth_reader_builds_pointcloud(self, tmp_path):
        img_path = str(tmp_path / "pic.png")
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 255, (8, 10, 3))
        _write_png(img_path, rgb)
        os.makedirs(tmp_path / "depth_npy")
        depth = rng.rand(8, 10).astype(np.float32)
        np.save(tmp_path / "depth_npy" / "0_pred.npy", depth)

        sc = readers.read_image_depth_scene(img_path)
        assert sc.pointcloud is not None
        pts = sc.pointcloud.positions.reshape(8, 10, 3)
        # z axis flipped to OpenGL; magnitude = depth + 0.5 shift
        np.testing.assert_allclose(-pts[..., 2], depth + 0.5, atol=1e-6)
        # center pixel maps to the optical axis
        focal = camera_lib.fov2focal(np.pi / 2.0, 10)
        np.testing.assert_allclose(
            pts[0, 0, 0], (0 - 5.0) * (depth[0, 0] + 0.5) / focal, atol=1e-5
        )
        np.testing.assert_allclose(
            sc.pointcloud.colors, rgb.reshape(-1, 3) / 255.0, atol=1e-3
        )
        assert sc.load_depth(0).shape == (8, 10)

    def test_registry(self):
        for name in (
            "ColmapReFormat",
            "NerfReFormat",
            "ImageReFormat",
            "ImageDepthReFormat",
        ):
            assert callable(readers.parse_data_format(name))
