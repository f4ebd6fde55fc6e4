"""Per-scene DTU fine-tuning dataset (`--dataset_name dtu_ft`).

The reference's dtu_test_inf dev_scripts select `dataset_name='dtu_ft'`
(/root/reference/dev_scripts/dtu_test_inf/inftest_scan1.sh) but its repo
ships no such data module — the scripts are unrunnable there. Here the
per-scene DTU workflow is served by the same MVSNet-preprocessed-layout
loader as feed-forward training (`dtu_dataset.py`): it already implements
the per-scene item contract (get_item / get_init_item / get_campos_ray /
load_init_depth_points) that train_ft.py and test_ft.py consume, so the
fine-tune variant only pins DTU-appropriate defaults (black background,
near/far from the cam.txt sweep unless overridden by --near_plane/
--far_plane, which the inftest scripts set to 2.0/4.725).

Plane background (`--bgmodel *plane`): the vendored Point-NeRF dtu_ft
dataset attaches per-scan ground-plane parameters to every item
(pointnerf/data/dtu_ft_dataset.py:732-735,894-899) with the plane index
read from a `dtu_test_ground.txt` list (":420-427"; the file itself ships
in neither tree). Mirrored here: the hardcoded plane table is the data
contract (unavoidable constants), and the index comes from
`{data_root}/dtu_test_ground.txt` lines of "scanN idx" when present,
defaulting to 0.
"""
from __future__ import annotations

import os

import numpy as np

from .dtu_dataset import DtuDataset

# vendored pointnerf/data/dtu_ft_dataset.py:894-899 — per-scan DTU ground
# plane (a point on the plane, its normal, and the table's albedo used by
# the plane-color fit filter in set_bg)
_PLANE_PNT = [[-0.49666997, 0.52160616, 3.6239593],
              [0.20770223, -0.74818161, 3.98697683],
              [-0.04889537, -0.84123057, 4.03164617]]
_PLANE_NORMAL = [[-0.11364093, 0.38778102, 0.91471942],
                 [-0.11165793, 0.3806543, 0.91795142],
                 [-0.11154823, 0.3783277, 0.91892608]]
_PLANE_COLOR = [[1.0, 1.0, 1.0],
                [150.72447808 / 255, 99.68367002 / 255, 63.40976961 / 255],
                [80.28243032 / 255, 54.3915082 / 255, 35.07029825 / 255]]


class DtuFtDataset(DtuDataset):

    def __init__(self, opt):
        super().__init__(opt)
        self.plane_ind = 0
        lst = os.path.join(str(opt.data_root), "dtu_test_ground.txt")
        if os.path.exists(lst):
            for line in open(lst):
                info = line.strip().split()
                if len(info) >= 2 and info[0] == str(self.scan):
                    self.plane_ind = int(info[1])
                    break

    def _attach_plane(self, item):
        if str(getattr(self.opt, "bgmodel", "no")).endswith("plane"):
            i = self.plane_ind
            item["plane_pnt"] = np.asarray(_PLANE_PNT[i], np.float32)
            item["plane_normal"] = np.asarray(_PLANE_NORMAL[i], np.float32)
            item["plane_color"] = np.asarray(_PLANE_COLOR[i], np.float32)
        return item

    def get_item(self, idx, full_img=False, rng=None):
        return self._attach_plane(super().get_item(idx, full_img, rng))
