"""Data pipeline: datasets, online degradations, samplers, prefetch.

Host-side numpy/cv2 (data augmentation runs on CPU workers; the device feed
is double-buffered in data/prefetch.py — the TPU answer to the reference's
CUDAPrefetcher side-stream, prefetch_dataloader.py:82-140).
"""
from copy import deepcopy

from comfyui_keep_tpu.utils.registry import DATASET_REGISTRY
from comfyui_keep_tpu.data import datasets  # noqa: F401 — registers datasets


def build_dataset(opt):
    """Reference data/__init__.py:25-37."""
    opt = deepcopy(opt)
    return DATASET_REGISTRY.get(opt["type"])(opt)


def build_dataloader(dataset, dataset_opt, num_devices=1, dist=False,
                     sampler=None, seed=None):
    """Loader factory (reference data/__init__.py:40-90): phase-dependent
    batch/worker sizing, shuffle when unsampled, deterministic seeding.
    num_devices plays the reference's num_gpu role (batch multiplier in the
    single-process case — one jitted step feeds all local devices)."""
    from comfyui_keep_tpu.data.prefetch import DataLoader

    phase = dataset_opt.get("phase", "train")
    if phase == "train":
        if dist:
            batch_size = dataset_opt["batch_size_per_gpu"]
            num_workers = dataset_opt.get("num_worker_per_gpu", 0)
        else:
            mult = 1 if num_devices == 0 else num_devices
            batch_size = dataset_opt["batch_size_per_gpu"] * mult
            num_workers = dataset_opt.get("num_worker_per_gpu", 0) * mult
        return DataLoader(dataset, batch_size=batch_size,
                          shuffle=sampler is None, sampler=sampler,
                          num_workers=num_workers, drop_last=True,
                          seed=seed or 0)
    if phase in ("val", "test"):
        return DataLoader(dataset, batch_size=1, shuffle=False,
                          num_workers=0, drop_last=False)
    raise ValueError(f"Wrong dataset phase: {phase}. "
                     "Supported ones are 'train', 'val' and 'test'.")
