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


def _fake_tsv(path):
    """Minimal scannetv2-labels.combined.tsv: header + rows whose column 0
    is the raw id and column 4 ('nyu40id') the target."""
    rows = [
        "id\traw_category\tcategory\tcount\tnyu40id\tnyu40class",
        "1\twall\twall\t100\t1\twall",
        "3\tchair\tchair\t30\t5\tchair",
        "7\ttable\ttable\t12\t7\ttable",
        "1163\tobject\tobject\t2\t39\totherfurniture",
        "50\tmystery\tmystery\t1\t\t",      # empty nyu40id -> dropped
    ]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def test_read_label_mapping(tmp_path):
    from sgnerf_tpu.data.prepare_scannet import read_label_mapping
    tsv = str(tmp_path / "labels.tsv")
    _fake_tsv(tsv)
    m = read_label_mapping(tsv)
    assert m == {0: 0, 1: 1, 3: 5, 7: 7, 1163: 39}


def test_export_label_images_roundtrip(tmp_path):
    """Raw-id label-filt PNGs -> exported/label nyu40 PNGs that
    scannet_ft_dataset's remapper consumes (round-trip to 20-class ids)."""
    import os
    from PIL import Image
    from sgnerf_tpu.data.prepare_scannet import export_label_images
    from sgnerf_tpu.data.scannet_ft_dataset import label_remapper

    tsv = str(tmp_path / "labels.tsv")
    _fake_tsv(tsv)
    src = tmp_path / "label-filt"
    src.mkdir()
    raw = np.array([[0, 1, 3], [7, 1163, 50]], np.int32)
    for i in range(3):
        Image.fromarray(raw, mode="I").save(src / f"{i}.png")

    out = tmp_path / "exported" / "label"
    written = export_label_images(str(src), str(out), tsv, frame_skip=2)
    assert written == [0, 2]
    assert sorted(os.listdir(out)) == ["0.png", "2.png"]

    with Image.open(out / "0.png") as im:
        nyu = np.asarray(im.convert(mode="I"))
    # nyu40 ids per the tsv; unmapped raw id 50 -> 0
    np.testing.assert_array_equal(nyu, [[0, 1, 5], [7, 39, 0]])
    # the dataset's remapper turns these into 20-class training ids
    remapped = label_remapper()[np.clip(nyu, 0, 255)]
    np.testing.assert_array_equal(remapped, [[255, 0, 4], [6, 19, 255]])


def test_export_label_images_resize(tmp_path):
    from PIL import Image
    from sgnerf_tpu.data.prepare_scannet import export_label_images
    tsv = str(tmp_path / "labels.tsv")
    _fake_tsv(tsv)
    src = tmp_path / "label-filt"
    src.mkdir()
    raw = np.kron(np.array([[1, 3], [7, 0]], np.int32), np.ones((4, 4), np.int32))
    Image.fromarray(raw, mode="I").save(src / "0.png")
    out = tmp_path / "label"
    export_label_images(str(src), str(out), tsv, image_size=(4, 4))
    with Image.open(out / "0.png") as im:
        small = np.asarray(im.convert(mode="I"))
    # NEAREST: each 2x2 quadrant keeps its (mapped) id, no interpolation
    np.testing.assert_array_equal(
        small, np.kron(np.array([[1, 5], [7, 0]]), np.ones((2, 2), int)))


def test_prepare_cli_label_export(tmp_path):
    """main() drives .sens export + label export per scene dir."""
    import os
    from PIL import Image
    from sgnerf_tpu.data.prepare_scannet import main
    scans = tmp_path / "scans"
    scene = scans / "scene0000_00"
    scene.mkdir(parents=True)
    _make_sens(str(scene / "scene0000_00.sens"))
    lf = scene / "label-filt"
    lf.mkdir()
    for i in range(2):
        Image.fromarray(np.full((12, 16), 3, np.int32), mode="I").save(
            lf / f"{i}.png")
    tsv = str(tmp_path / "labels.tsv")
    _fake_tsv(tsv)
    out = tmp_path / "outp"
    main(["--scannet_path", str(scans), "--output_path", str(out),
          "--export_label_images", "--label_map_file", tsv,
          "--output_image_width", "16", "--output_image_height", "12"])
    exp = out / "scene0000_00"
    assert sorted(os.listdir(exp)) == ["color", "depth", "intrinsic",
                                       "label", "pose"]
    with Image.open(exp / "label" / "0.png") as im:
        assert np.asarray(im.convert(mode="I")).max() == 5
