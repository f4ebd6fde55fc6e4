"""ScanNet preprocessing tests: synthetic .sens round-trip, mesh->pth."""
import io
import struct
import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.fast


def _make_sens(path, n_frames=2, cw=16, ch=12, dw=8, dh=6):
    """Write a minimal valid .sens v4 file with JPEG color + zlib u16 depth."""
    from PIL import Image
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"synthetic"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):  # intr color, extr color, intr depth, extr depth
            f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack("i", 2))   # color: jpeg
        f.write(struct.pack("i", 1))   # depth: zlib_ushort
        f.write(struct.pack("4I", cw, ch, dw, dh))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", n_frames))
        depths = []
        for i in range(n_frames):
            c2w = np.eye(4, dtype=np.float32)
            c2w[0, 3] = float(i)
            f.write(c2w.tobytes())
            f.write(struct.pack("QQ", 0, 0))  # timestamps
            img = (rng.uniform(0, 255, (ch, cw, 3))).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG")
            jpg = buf.getvalue()
            d = (rng.integers(500, 3000, (dh, dw))).astype(np.uint16)
            depths.append(d)
            dz = zlib.compress(d.tobytes())
            f.write(struct.pack("QQ", len(jpg), len(dz)))
            f.write(jpg)
            f.write(dz)
    return depths


def test_sensor_data_roundtrip(tmp_path):
    from sgnerf_tpu.data.prepare_scannet import SensorData
    p = str(tmp_path / "scene.sens")
    depths = _make_sens(p)
    sd = SensorData(p)
    assert sd.sensor_name == "synthetic"
    assert len(sd.frames) == 2
    assert sd.color_width == 16 and sd.depth_height == 6
    np.testing.assert_array_equal(sd.decode_depth(0), depths[0])
    np.testing.assert_array_equal(sd.decode_depth(1), depths[1])
    img = sd.decode_color(0)
    assert img.shape == (12, 16, 3)
    assert sd.frames[1].camera_to_world[0, 3] == 1.0


def test_sensor_export_layout(tmp_path):
    import os
    from sgnerf_tpu.data.prepare_scannet import SensorData
    p = str(tmp_path / "scene.sens")
    _make_sens(p)
    sd = SensorData(p)
    out = str(tmp_path / "exported")
    sd.export(out, image_size=(12, 16))
    for sub, n in (("color", 2), ("depth", 2), ("pose", 2)):
        files = os.listdir(os.path.join(out, sub))
        assert len(files) == n, (sub, files)
    intr = np.loadtxt(os.path.join(out, "intrinsic", "intrinsic_color.txt"))
    assert intr.shape == (4, 4)


def test_preprocess_3d(tmp_path):
    torch = pytest.importorskip("torch")
    from sgnerf_tpu.utils.ply import write_ply
    from sgnerf_tpu.data.prepare_scannet import preprocess_3d
    rng = np.random.default_rng(1)
    n = 50
    mesh = str(tmp_path / "scene_vh_clean_2.ply")
    write_ply(mesh, {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "red": rng.integers(0, 255, n).astype(np.uint8),
        "green": rng.integers(0, 255, n).astype(np.uint8),
        "blue": rng.integers(0, 255, n).astype(np.uint8)})
    labels = str(tmp_path / "scene_vh_clean_2.labels.ply")
    write_ply(labels, {
        "x": np.zeros(n, np.float32), "y": np.zeros(n, np.float32),
        "z": np.zeros(n, np.float32),
        "label": rng.integers(0, 41, n).astype(np.uint8)})
    out = str(tmp_path / "points.pth")
    coords, colors, lab = preprocess_3d(mesh, labels, out)
    assert coords.shape == (n, 3)
    assert colors.min() >= -1.0 and colors.max() <= 1.0
    data = torch.load(out, weights_only=False)
    assert len(data) == 3 and len(data[0]) == n
    # remapped labels are in {0..19} or 255
    uniq = set(np.unique(lab).tolist())
    assert uniq <= set(range(20)) | {255.0, 255}
