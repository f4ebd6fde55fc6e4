"""Dataset factory, mirroring the reference naming convention
(/root/reference/data/__init__.py:10-50): dataset `<name>` resolves to module
`<name>_dataset` exporting class `<CamelName>Dataset`."""
from __future__ import annotations

import importlib


def find_dataset_class_by_name(name: str):
    module = importlib.import_module(f"sgnerf_tpu.data.{name}_dataset")
    target = name.replace("_", "") + "dataset"
    for attr in dir(module):
        if attr.lower() == target:
            return getattr(module, attr)
    raise RuntimeError(
        f"no dataset class matching {name} in sgnerf_tpu.data.{name}_dataset")


def create_dataset(opt):
    cls = find_dataset_class_by_name(opt.dataset_name)
    return cls(opt)
