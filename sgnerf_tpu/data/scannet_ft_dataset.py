"""ScanNet per-scene dataset (numpy, torch-free except `points.pth` loading).

Mirrors /root/reference/data/scannet_ft_dataset.py:
  * `exported/{color,pose,depth,label,intrinsic}` layout;
  * pose sanity filter |c2w|<30 (:378-384); blur-list filter (:305-318);
  * train split = every `train_step`-th frame, test = the rest (:321-374);
  * __getitem__ (:632-751): per-view item with `random_sample_size`^2 sampled
    pixels, ray dirs via get_dtu_raydir, gt colors, remapped semantic labels
    (ScanNet-40 ids -> 20 classes, :652-662), full gt_semantic_img;
  * load_init_points (:463-495): exported/pcd.ply + exported/points.pth
    ((coords, colors[-1..1], labels) tuple) with `ranges` crop;
  * load_init_depth_points (:505-536): unproject all depth maps;
  * get_campos_ray (:386-400).

Items are plain numpy dicts; the training loop batches/ships them to device.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..ops.camera import get_dtu_raydir
import jax.numpy as jnp
import jax
import numpy as _np


SCANNET20_REMAP_IDS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28,
                       33, 34, 36, 39]


def label_remapper() -> np.ndarray:
    remap = np.full(256, 255, dtype=np.int32)
    for i, x in enumerate(SCANNET20_REMAP_IDS):
        remap[x] = i
    return remap


class ScannetFtDataset:
    def __init__(self, opt):
        self.opt = opt
        self.data_dir = opt.data_root
        self.scan = opt.scan
        self.split = opt.split
        self.img_wh = (int(opt.img_wh[0]), int(opt.img_wh[1]))
        self.width, self.height = self.img_wh
        self.near_far = [opt.near_plane, opt.far_plane]
        self.bg_color = self._parse_bg(opt.bg_color)
        self.remapper = label_remapper()
        self.build_init_metas()

        intr_path = os.path.join(self.data_dir, self.scan,
                                 "exported/intrinsic/intrinsic_color.txt")
        self.intrinsic = np.loadtxt(intr_path).astype(np.float32)[:3, :3]
        d_path = os.path.join(self.data_dir, self.scan,
                              "exported/intrinsic/intrinsic_depth.txt")
        self.depth_intrinsic = (np.loadtxt(d_path).astype(np.float32)[:3, :3]
                                if os.path.exists(d_path) else self.intrinsic)
        with Image.open(self.image_paths[0]) as im:
            ow, oh = im.size
        self.intrinsic[0, :] *= self.width / ow
        self.intrinsic[1, :] *= self.height / oh
        self.total = len(self.id_list)

    # ------------------------------------------------------------------ metas

    @staticmethod
    def _parse_bg(bg):
        if not bg or bg == "black":
            return (0.0, 0.0, 0.0)
        if bg == "white":
            return (1.0, 1.0, 1.0)
        if bg == "red":
            return (1.0, 0.0, 0.0)
        if bg == "random":
            return "random"
        return tuple(float(x) for x in bg.split(","))

    def _pose_path(self, vid):
        return os.path.join(self.data_dir, self.scan, "exported/pose",
                            f"{vid}.txt")

    def _color_path(self, vid):
        return os.path.join(self.data_dir, self.scan, "exported/color",
                            f"{vid}.jpg")

    def _label_path(self, vid):
        return os.path.join(self.data_dir, self.scan, "exported/label",
                            f"{vid}.png")

    def _depth_path(self, vid):
        return os.path.join(self.data_dir, self.scan, "exported/depth",
                            f"{vid}.png")

    def _needs_depth(self) -> bool:
        """Per-ray gt depth is sampled only when a depth-supervised loss or
        depth output is requested (reference 'depths_h' input,
        mvs_points_volumetric_model.py:150-152)."""
        o = self.opt
        return bool(getattr(o, "depth_loss_items", ()) or
                    getattr(o, "compute_depth", 0) or
                    any(n.startswith("ray_depth_masked")
                        for n in (getattr(o, "color_loss_items", ()) or ())))

    def filter_valid_id(self, id_list: List[int]) -> List[int]:
        out = []
        for vid in id_list:
            c2w = np.loadtxt(self._pose_path(vid)).astype(np.float32)
            if np.max(np.abs(c2w)) < 30:
                out.append(vid)
        return out

    def remove_blurry(self, ids: List[int]) -> List[int]:
        blur_path = os.path.join(self.data_dir, self.scan,
                                 "exported/blur_list.txt")
        if not os.path.exists(blur_path):
            return ids
        with open(blur_path) as f:
            blur = {int(l.strip()) for l in f if l.strip()}
        return [i for i in ids if i not in blur]

    def build_init_metas(self):
        colordir = os.path.join(self.data_dir, self.scan, "exported/color")
        n = len([f for f in os.listdir(colordir)
                 if os.path.isfile(os.path.join(colordir, f))])
        self.image_paths = [self._color_path(i) for i in range(n)]
        self.all_id_list = self.filter_valid_id(list(range(n)))
        step = getattr(self.opt, "train_step", 5)
        self.train_id_list = self.all_id_list[::step]
        test_list = getattr(self.opt, "test_list", None)
        if test_list is not None:
            self.test_id_list = list(test_list)
        elif getattr(self.opt, "test_num_step", 1) != 1:
            self.test_id_list = [self.all_id_list[i]
                                 for i in range(len(self.all_id_list))
                                 if i % step != 0]
        else:
            self.test_id_list = self.all_id_list
        self.train_id_paths = [[self._color_path(i)
                                for i in self.train_id_list]]
        self.test_id_paths = [[self._color_path(i) for i in self.test_id_list]]
        self.id_list = (self.train_id_list if self.split == "train"
                        else self.test_id_list)

    def __len__(self):
        max_len = getattr(self.opt, "max_len", -1)
        return len(self.id_list) if max_len <= 0 else max_len

    # ------------------------------------------------------------------ items

    def _sample_pixels(self, rng: np.random.Generator):
        margin = getattr(self.opt, "edge_filter", 3)
        s = self.opt.random_sample_size
        mode = self.opt.random_sample
        if mode == "patch":
            ix = rng.integers(margin, self.width - margin - s + 1)
            iy = rng.integers(margin, self.height - margin - s + 1)
            px, py = np.meshgrid(np.arange(ix, ix + s, dtype=np.float32),
                                 np.arange(iy, iy + s, dtype=np.float32))
        elif mode == "random":
            px = rng.integers(margin, self.width - margin,
                              size=(s, s)).astype(np.float32)
            py = rng.integers(margin, self.height - margin,
                              size=(s, s)).astype(np.float32)
        elif mode == "random2":
            px = rng.uniform(margin, self.width - margin - 1e-5,
                             size=(s, s)).astype(np.float32)
            py = rng.uniform(margin, self.height - margin - 1e-5,
                             size=(s, s)).astype(np.float32)
        else:  # full frame
            px, py = np.meshgrid(
                np.arange(margin, self.width - margin, dtype=np.float32),
                np.arange(margin, self.height - margin, dtype=np.float32))
        return px, py

    def get_item(self, idx: int, full_img: bool = False,
                 rng: Optional[np.random.Generator] = None) -> Dict:
        rng = rng or np.random.default_rng()
        vid = self.id_list[idx]
        with Image.open(self._color_path(vid)) as im:
            img = np.asarray(im.resize(self.img_wh, Image.NEAREST),
                             dtype=np.float32) / 255.0
        c2w = np.loadtxt(self._pose_path(vid)).astype(np.float32)
        camrot = c2w[:3, :3]
        campos = c2w[:3, 3]

        sem = None
        lp = self._label_path(vid)
        if os.path.exists(lp):
            with Image.open(lp) as im:
                sem = np.asarray(
                    im.convert(mode="I").resize(self.img_wh, Image.NEAREST),
                    dtype=np.int64)
            sem = self.remapper[np.clip(sem, 0, 255)]

        px, py = self._sample_pixels(rng)
        pix = np.stack([px, py], axis=-1)
        ipx, ipy = px.astype(np.int32), py.astype(np.int32)
        gt = img[ipy, ipx].reshape(-1, 3)
        raydir = get_dtu_raydir(
            jnp.asarray(pix), jnp.asarray(self.intrinsic),
            jnp.asarray(camrot), getattr(self.opt, "dir_norm", 0) > 0)
        raydir = np.asarray(raydir).reshape(-1, 3)

        item = {
            "image_path": self._color_path(vid),
            "intrinsic": self.intrinsic,
            "campos": campos,
            "c2w": c2w,
            "camrotc2w": camrot,
            "near": np.float32(self.near_far[0]),
            "far": np.float32(self.near_far[1]),
            "h": self.height, "w": self.width,
            "id": idx, "vid": vid,
            "pixel_idx": pix.reshape(-1, 2),
            "raydir": raydir.astype(np.float32),
            "gt_image": gt.astype(np.float32),
            "train_id_paths": self.train_id_paths,
        }
        if sem is not None:
            item["pixel_label"] = sem[ipy, ipx].reshape(-1).astype(np.int32)
            item["gt_semantic_img"] = sem
        if self._needs_depth():
            dpath = self._depth_path(vid)
            if os.path.exists(dpath):
                with Image.open(dpath) as im:
                    dm = np.asarray(
                        im.resize(self.img_wh, Image.NEAREST),
                        dtype=np.float32) / 1000.0
                dm[(dm > 8.0) | (dm < 0.3)] = 0    # read_depth clipping
                item["gt_depth"] = dm[ipy, ipx].reshape(-1)
                item["gt_mask"] = (item["gt_depth"] > 0).astype(np.float32)
        if full_img:
            item["full_image"] = img
        if self.bg_color == "random":
            item["bg_color"] = (np.ones(3, np.float32)
                                if rng.uniform() > 0.5
                                else np.zeros(3, np.float32))
        else:
            item["bg_color"] = np.asarray(self.bg_color, np.float32)
        return item

    __getitem__ = get_item

    # ------------------------------------------------------- init point cloud

    def load_init_points(self):
        """Returns (xyz [N,3], feats [N,3] in 0..255, labels [N] or None)."""
        from ..utils.ply import read_ply
        points_path = os.path.join(self.data_dir, self.scan,
                                   "exported/pcd.ply")
        d = read_ply(points_path)
        xyz = np.stack([d["x"], d["y"], d["z"]], -1).astype(np.float32)

        pth = os.path.join(self.data_dir, self.scan, "exported/points.pth")
        feats, labels = None, None
        if os.path.exists(pth):
            import torch
            data = torch.load(pth, map_location="cpu", weights_only=False)
            feats = (np.asarray(data[1]) + 1.0) * 127.5
            loc = np.asarray(data[0], np.float32)
            labels = np.asarray(data[2]) if len(data) > 2 else None
            # points.pth rows correspond to pcd.ply rows in the export
            if len(loc) == len(xyz):
                pass
        if feats is None and "red" in d:
            feats = np.stack([d["red"], d["green"], d["blue"]],
                             -1).astype(np.float32)
        ranges = np.asarray(getattr(self.opt, "ranges",
                                    (-100.0,) * 3 + (100.0,) * 3))
        if ranges[0] > -99.0:
            mask = np.all((xyz >= ranges[:3]) & (xyz <= ranges[3:]), axis=-1)
            xyz = xyz[mask]
            if feats is not None and len(feats) == len(mask):
                feats = feats[mask]
            if labels is not None and len(labels) == len(mask):
                labels = labels[mask]
        return xyz, feats, labels

    def read_depth(self, path: str) -> np.ndarray:
        with Image.open(path) as im:
            depth = np.asarray(im, dtype=np.float32) / 1000.0
        depth[depth > 8.0] = 0
        depth[depth < 0.3] = 0
        return depth

    def load_init_depth_points(self, vox_res: int = 0) -> np.ndarray:
        """Unproject every depth map into a world point cloud."""
        from ..ops.scatter import voxel_downsample_xyz
        inv_k = np.linalg.inv(self.depth_intrinsic).T
        out = []
        for vid in self.all_id_list:
            dpath = os.path.join(self.data_dir, self.scan, "exported/depth",
                                 f"{vid}.png")
            if not os.path.exists(dpath):
                continue
            depth = self.read_depth(dpath)
            h, w = depth.shape
            py, px = np.mgrid[0:h, 0:w].astype(np.float32)
            cam = np.stack([px * depth, py * depth, depth], -1) @ inv_k
            cam = cam[cam[..., 2] > 0]
            c2w = np.loadtxt(self._pose_path(vid)).astype(np.float32)
            ones = np.ones_like(cam[..., :1])
            world = (np.concatenate([cam, ones], -1) @ c2w.T)[..., :3]
            if vox_res > 0:
                world = np.asarray(voxel_downsample_xyz(
                    jnp.asarray(world), vox_res))
            out.append(world)
        pts = np.concatenate(out, axis=0) if out else np.zeros((0, 3))
        ranges = np.asarray(getattr(self.opt, "ranges",
                                    (-100.0,) * 3 + (100.0,) * 3))
        if ranges[0] > -99.0 and len(pts):
            mask = np.all((pts >= ranges[:3]) & (pts <= ranges[3:]), axis=-1)
            pts = pts[mask]
        return pts.astype(np.float32)

    def get_campos_ray(self):
        center = np.asarray(self.img_wh, np.float32)[None] // 2
        camposes, centerdirs = [], []
        for vid in self.id_list:
            c2w = np.loadtxt(self._pose_path(vid)).astype(np.float32)
            camposes.append(c2w[:3, 3])
            d = get_dtu_raydir(jnp.asarray(center),
                               jnp.asarray(self.intrinsic),
                               jnp.asarray(c2w[:3, :3]), True)
            centerdirs.append(np.asarray(d))
        return (np.stack(camposes).astype(np.float32),
                np.concatenate(centerdirs).astype(np.float32))

    # ------------------------------------------------- MVS init-view batches

    def get_init_item(self, idx: int) -> Dict:
        """Per-view MVS batch: the view plus its init_view_num-1 nearest
        neighbor views (images, c2w/w2c, intrinsics) for cost-volume depth
        inference (reference get_init_item, scannet_ft_dataset.py:562-630)."""
        V = max(1, getattr(self.opt, "init_view_num", 3))
        vid = self.id_list[idx]
        poses = {v: np.loadtxt(self._pose_path(v)).astype(np.float32)
                 for v in self.id_list}
        ref_pos = poses[vid][:3, 3]
        others = sorted((v for v in self.id_list if v != vid),
                        key=lambda v: np.linalg.norm(poses[v][:3, 3]
                                                     - ref_pos))
        views = [vid] + others[:V - 1]

        imgs, c2ws, w2cs, intrinsics = [], [], [], []
        for v in views:
            with Image.open(self._color_path(v)) as im:
                imgs.append(np.asarray(im.resize(self.img_wh, Image.NEAREST),
                                       dtype=np.float32) / 255.0)
            c2w = poses[v]
            c2ws.append(c2w)
            w2cs.append(np.linalg.inv(c2w).astype(np.float32))
            intrinsics.append(self.intrinsic)
        item = {
            "images": np.stack(imgs),                  # (V,H,W,3)
            "c2ws": np.stack(c2ws),
            "w2cs": np.stack(w2cs),
            "intrinsics": np.stack(intrinsics),
            "view_ids": views,
            "near": np.float32(self.near_far[0]),
            "far": np.float32(self.near_far[1]),
        }
        dpath = os.path.join(self.data_dir, self.scan, "exported/depth",
                             f"{vid}.png")
        if os.path.exists(dpath):
            item["gt_depth"] = self.read_depth(dpath)
        return item
