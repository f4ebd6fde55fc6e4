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
"""
from __future__ import annotations

from .dtu_dataset import DtuDataset


class DtuFtDataset(DtuDataset):
    pass
