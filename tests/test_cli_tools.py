"""CLI smoke for the remaining run/ entry points: render_vid, editing,
test_edit, visualize, vis_grow_train — each drives the real script in a
subprocess against a tiny trained checkpoint (test_cli.py covers
train_ft/test_ft/train)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_e2e_scannet import scene_dir  # noqa: F401  (fixture reuse)
from tests.test_cli import COMMON, _run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained(scene_dir, tmp_path_factory):  # noqa: F811
    """Train 4 steps so every tool below has a checkpoint to load."""
    ckpt = tmp_path_factory.mktemp("ckpt")
    args = ["--name", "tools", "--data_root", scene_dir,
            "--checkpoints_dir", str(ckpt),
            "--maximum_step", "4", "--save_iter_freq", "4",
            "--test_freq", "0", "--print_freq", "2", "--test_num", "0",
            ] + COMMON
    r = _run("train_ft.py", args)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(str(ckpt / "tools" / "4_net_ray_marching.npz"))
    return scene_dir, str(ckpt)


def _tool_args(scene_dir, ckpt, extra=()):
    return (["--name", "tools", "--data_root", scene_dir,
             "--checkpoints_dir", ckpt, "--resume_iter", "latest"]
            + COMMON + list(extra))


@pytest.mark.slow
def test_render_vid_cli(trained):
    scene_dir, ckpt = trained  # noqa: F811
    r = _run("render_vid.py", _tool_args(
        scene_dir, ckpt, ["--render_stride", "3", "--test_num", "2"]))
    assert r.returncode == 0, r.stderr[-2000:]
    vid_dir = os.path.join(ckpt, "tools", "images", "vid")
    assert os.path.isdir(vid_dir) and len(os.listdir(vid_dir)) > 0


@pytest.mark.slow
def test_visualize_cli(trained):
    scene_dir, ckpt = trained  # noqa: F811
    r = _run("visualize.py", _tool_args(scene_dir, ckpt))
    assert r.returncode == 0, r.stderr[-2000:]
    out = os.path.join(ckpt, "tools", "visual")
    assert os.path.exists(os.path.join(out, "cloud.txt"))
    assert os.path.exists(os.path.join(out, "cloud_neuralpcd.ply"))


@pytest.mark.slow
def test_vis_grow_train_cli(trained):
    scene_dir, ckpt = trained  # noqa: F811
    r = _run("vis_grow_train.py", _tool_args(
        scene_dir, ckpt, ["--test_num", "1", "--prob_thresh", "0.0"]))
    assert r.returncode == 0, r.stderr[-2000:]
    gv = os.path.join(ckpt, "tools", "grow_vis")
    assert os.path.exists(os.path.join(gv, "probe_0.txt"))


@pytest.mark.slow
def test_editing_and_test_edit_cli(trained):
    scene_dir, ckpt = trained  # noqa: F811
    # editing composes saved neural point clouds (reference run/editing.py);
    # the exported .pth from training is the part source
    pth = os.path.join(ckpt, "tools", "4_net_ray_marching.pth")
    assert os.path.exists(pth)
    r = _run("editing.py", _tool_args(
        scene_dir, ckpt,
        ["--resume_dir", os.path.join(ckpt, "tools"),
         "--neural_points_names", "4_net_ray_marching.pth",
         "--render_stride", "6"]))
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("test_edit.py", _tool_args(
        scene_dir, ckpt,
        ["--resume_dir", os.path.join(ckpt, "tools"),
         "--neural_points_names", "4_net_ray_marching.pth",
         "--test_num", "1", "--test_num_step", "4",
         "--save_predict_label", "1"]))
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_gui_server_boots_and_renders(trained):
    """run/gui.py serves the viewer page and a live JPEG render."""
    import time
    import urllib.request
    scene_dir, ckpt = trained  # noqa: F811
    port = 18731
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GUI_PORT"] = str(port)
    env.pop("PYTHONPATH", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "run", "gui.py")]
        + _tool_args(scene_dir, ckpt), cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        html = jpeg = None
        deadline = time.time() + 240
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise AssertionError(f"gui exited early:\n{out[-2000:]}")
            try:
                html = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=5).read()
                break
            except Exception:
                time.sleep(2)
        assert html and b"sgnerf_tpu viewer" in html
        jpeg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?az=0&el=0.2&r=2.5",
            timeout=180).read()
        assert jpeg[:2] == b"\xff\xd8"  # JPEG magic
    finally:
        proc.kill()
        proc.wait()
