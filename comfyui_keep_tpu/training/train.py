"""Train pipeline (reference wm_basicsr/train.py:91-210):
parse options → dirs/loggers → dataloaders (EnlargedSampler) → build trainer
→ auto-resume → prefetcher → loop {feed, step, log, save, validate}.
"""
import os
import time
from typing import Dict, Optional

import numpy as np

from comfyui_keep_tpu.data import build_dataset
from comfyui_keep_tpu.data.prefetch import (CPUPrefetcher, DataLoader,
                                            DevicePrefetcher)
from comfyui_keep_tpu.data.samplers import EnlargedSampler
from comfyui_keep_tpu.training.trainers import build_model, _make_mesh
from comfyui_keep_tpu.training.state import TrainState
from comfyui_keep_tpu.utils.logger import (AvgTimer, MessageLogger,
                                           get_env_info, get_root_logger)
from comfyui_keep_tpu.utils.misc import make_exp_dirs, set_random_seed


def create_train_val_loaders(opt, logger, num_devices=1):
    from comfyui_keep_tpu.data import build_dataloader

    train_loader, val_loaders = None, []
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            ds = build_dataset(dataset_opt)
            sampler = EnlargedSampler(
                len(ds), ratio=dataset_opt.get("dataset_enlarge_ratio", 1))
            train_loader = build_dataloader(
                ds, {**dataset_opt, "phase": "train"}, sampler=sampler,
                num_devices=num_devices, seed=opt.get("manual_seed"))
            logger.info(f"train dataset {dataset_opt['type']}: {len(ds)} items")
        elif phase.startswith("val"):
            ds = build_dataset(dataset_opt)
            val_loaders.append(
                (dataset_opt.get("name", phase), dataset_opt.get("type", ""),
                 build_dataloader(ds, {**dataset_opt, "phase": "val"})))
            logger.info(f"val dataset {dataset_opt['type']}: {len(ds)} items")
    return train_loader, val_loaders


def run_validation(trainer, params, val_loaders, metrics_opt, opt=None,
                   current_iter=None):
    """Validate on every val loader (reference train.py validation hook):
    video-style datasets through validate_videos, the rest per-image.

    Returns {dataset_name: {metric: value}} — for video datasets the
    per-folder averages (validate_videos' second return value); the
    per-folder detail is logged at info level
    (video_base_model.py:150-160 logs per-folder then the average).

    With val.save_img, restored images land in path.visualization using the
    reference's layout: images — train runs save
    <vis>/<img_name>/<img_name>_<iter>.png, test runs
    <vis>/<dataset>/<img_name>_<suffix-or-exp-name>.png
    (sr_model.py:220-231); video frames (img_name carries 'folder/frame') —
    <vis>/<dataset>/<folder>/<frame>_<iter-or-tag>.png
    (video_base_model.py:74-85)."""
    from comfyui_keep_tpu.training.validation import (validate_images,
                                                      validate_videos)
    logger = get_root_logger()
    opt = opt or {}
    vis_dir = opt.get("path", {}).get("visualization")
    save_img = bool(opt.get("val", {}).get("save_img")) and vis_dir

    def make_save_fn(ds_name):
        if not save_img:
            return None

        def save(img_bgr_u8, img_name):
            import cv2
            if opt.get("is_train") and current_iter is not None:
                tag = str(current_iter)
            else:
                tag = opt.get("val", {}).get("suffix") or opt.get("name", "x")
            if "/" in img_name:  # video frame: 'folder/00000042'
                folder, frame = img_name.rsplit("/", 1)
                path = os.path.join(vis_dir, ds_name, folder,
                                    f"{frame}_{tag}.png")
            elif opt.get("is_train") and current_iter is not None:
                path = os.path.join(vis_dir, img_name,
                                    f"{img_name}_{tag}.png")
            else:
                path = os.path.join(vis_dir, ds_name, f"{img_name}_{tag}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            cv2.imwrite(path, img_bgr_u8)
        return save

    results = {}
    fwd = lambda lq: trainer.forward(params, lq)
    for name, ds_type, loader in val_loaders:
        if ds_type.startswith(("Video", "VFHQ", "REDS", "Vimeo")):
            per_folder, avg = validate_videos(fwd, loader, metrics_opt,
                                              save_fn=make_save_fn(name))
            for folder, fm in per_folder.items():
                logger.info(f"  [{name}] {folder}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in fm.items()))
            results[name] = avg
        else:
            results[name] = validate_images(fwd, loader, metrics_opt,
                                            save_fn=make_save_fn(name))
    return results


def train_pipeline(opt: Dict, max_iters: Optional[int] = None, use_mesh=True,
                   trainer_kwargs: Optional[Dict] = None):
    import jax
    logger = get_root_logger()
    logger.info(get_env_info())
    set_random_seed(opt.get("manual_seed", 0))
    if opt["path"].get("experiments_root"):
        make_exp_dirs(opt)

    # mesh first: the loader's global batch is batch_size_per_gpu x the
    # data-axis size (the reference's num_gpu batch multiplier, one jitted
    # step feeding all local devices)
    mesh = _make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    train_loader, val_loaders = create_train_val_loaders(
        opt, logger, num_devices=mesh.devices.size if mesh else 1)
    trainer = build_model(opt, mesh=mesh, **(trainer_kwargs or {}))
    state = trainer.make_state(jax.random.PRNGKey(opt.get("manual_seed", 0)))

    # auto-resume (train.py:68-88)
    if opt.get("auto_resume"):
        latest = TrainState.latest_state(opt["path"]["training_states"])
        if latest:
            opt_state_data = state.resume(latest)
            state.resume_optimizer(opt_state_data)
            # reload the matching network snapshot (reference train.py:68-88
            # pairs the .state file with its net_g_<iter>; resuming counters
            # without weights would silently continue from random init)
            from comfyui_keep_tpu.training.state import graft_tree
            from comfyui_keep_tpu.utils.checkpoint import load_npz
            net_path = os.path.join(opt["path"]["models"],
                                    f"net_g_{state.iter}.npz")
            if os.path.exists(net_path):
                net = load_npz(net_path)
                stats = {}
                state.params = graft_tree(state.params, net.get("params"),
                                          stats=stats)
                if state.ema_params is not None and "params_ema" in net:
                    state.ema_params = graft_tree(state.ema_params,
                                                  net["params_ema"],
                                                  stats=stats)
                # a partial graft means some leaves silently kept random
                # init (missing key / shape mismatch vs the checkpoint) —
                # surface it (base_model.py:254-287 warns per key)
                if stats.get("kept", 0):
                    logger.warning(
                        f"resumed from {latest} at iter {state.iter} but "
                        f"{stats['kept']} param leaves had no matching "
                        f"checkpoint entry (kept init); {stats.get('loaded', 0)}"
                        f" restored — check the network config vs {net_path}")
                else:
                    logger.info(
                        f"resumed from {latest} at iter {state.iter} "
                        f"({stats.get('loaded', 0)} param leaves + optimizer "
                        f"moments restored)")
                # trainer-owned extra state (GAN discriminator + optimizer)
                if hasattr(trainer, "load_extra_state"):
                    trainer.load_extra_state(state.resume_extra)
            else:
                logger.warning(
                    f"resume state {latest} has no matching {net_path}; "
                    f"continuing with fresh weights")

    total_iter = max_iters or opt.get("train", {}).get("total_iter", 1000)
    save_freq = opt.get("logger", {}).get("save_checkpoint_freq", 1e9)
    print_freq = opt.get("logger", {}).get("print_freq", 100)
    val_freq = opt.get("val", {}).get("val_freq")
    # tb/wandb writers (reference train.py init_tb_loggers: wandb first so
    # sync_tensorboard captures the tb stream; both master-only)
    tb_logger = None
    logger_opt = opt.get("logger", {})
    wandb_opt = logger_opt.get("wandb") or {}
    if wandb_opt.get("project") is not None:
        from comfyui_keep_tpu.utils.logger import init_wandb_logger
        init_wandb_logger(opt)
    if logger_opt.get("use_tb_logger"):
        from comfyui_keep_tpu.utils.logger import init_tb_logger
        tb_logger = init_tb_logger(
            os.path.join(opt["path"].get("log", "."), "tb_logger"))
    msg_logger = MessageLogger(opt, state.iter + 1, tb_logger)
    iter_timer, data_timer = AvgTimer(), AvgTimer()

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("data"))
    prefetcher = DevicePrefetcher(train_loader, sharding=sharding)

    epoch = state.epoch
    logs = {}
    while state.iter < total_iter:
        train_loader.epoch = epoch
        if train_loader.sampler is not None:
            train_loader.sampler.set_epoch(epoch)
        prefetcher.reset()
        batch = prefetcher.next()
        if batch is None and state.iter < total_iter:
            raise ValueError(
                "train loader produced no batches: dataset smaller than the "
                "global batch (batch_size_per_gpu x data-axis devices, "
                "drop_last) — raise dataset_enlarge_ratio or lower the batch")
        while batch is not None and state.iter < total_iter:
            data_timer.record()
            batch_arrays = {k: v for k, v in batch.items()
                            if not isinstance(v, list)}
            if hasattr(trainer, "feed_data"):
                # on-device synthesis feed (RealESRGAN-style trainers)
                batch_arrays = trainer.feed_data(batch_arrays)
            state, logs = trainer.train_step(state, batch_arrays)
            iter_timer.record()
            if state.iter % print_freq == 0:
                msg_logger({"iter": state.iter, "epoch": epoch,
                            "lrs": [trainer.current_lr(state.iter)],
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time(), **logs})
            if state.iter % save_freq == 0:
                state.save(opt["path"]["models"],
                           opt["path"]["training_states"], state.iter,
                           extra=trainer.extra_state()
                           if hasattr(trainer, "extra_state") else None)
            if val_loaders and val_freq and state.iter % val_freq == 0:
                # EMA weights when tracked (sr_model.py validation uses
                # net_g_ema); metrics land in the training log AND go to
                # the tb/wandb stream directly (sr_model.py:264
                # tb_logger.add_scalar(f'metrics/{ds}/{metric}')) — the
                # periodic msg_logger call already ran this iteration, so
                # merging into `logs` alone would never reach the writers
                vp = state.ema_params if state.ema_params is not None \
                    else state.params
                val_results = run_validation(
                    trainer, vp, val_loaders,
                    opt.get("val", {}).get("metrics", {}),
                    opt=opt, current_iter=state.iter)
                for name, res in val_results.items():
                    logger.info(f"validation [{name}] @{state.iter}: " +
                                ", ".join(f"{k}={v:.4f}"
                                          for k, v in res.items()))
                    for k, v in res.items():
                        if tb_logger is not None:
                            tb_logger.add_scalar(f"metrics/{name}/{k}", v,
                                                 state.iter)
                    logs.update({f"val/{name}/{k}": v
                                 for k, v in res.items()})
            batch = prefetcher.next()
        epoch += 1
        state.epoch = epoch
    return state, logs


def test_pipeline(opt: Dict, trainer_kwargs: Optional[Dict] = None):
    """Test pipeline (reference wm_basicsr/test.py:12-41): build the model,
    load weights from path.pretrain_network_g, run validation on every
    `test_*`/`val*` dataset and return {dataset_name: metrics}."""
    import jax
    logger = get_root_logger()
    set_random_seed(opt.get("manual_seed", 0))
    trainer = build_model(opt, **(trainer_kwargs or {}))
    params = trainer.init_params(jax.random.PRNGKey(0))
    ckpt = opt.get("path", {}).get("pretrain_network_g")
    if ckpt:
        from comfyui_keep_tpu.training.state import load_network_npz
        params = load_network_npz(ckpt)
        logger.info(f"loaded network weights from {ckpt}")

    loaders = []
    for phase, dataset_opt in sorted(opt["datasets"].items()):
        if not (phase.startswith("test") or phase.startswith("val")):
            continue
        ds = build_dataset(dataset_opt)
        name = dataset_opt.get("name", phase)
        logger.info(f"testing {name} ({len(ds)} items)")
        loaders.append((name, dataset_opt.get("type", ""),
                        DataLoader(ds, batch_size=1, drop_last=False)))
    results = run_validation(trainer, params, loaders,
                             opt.get("val", {}).get("metrics", {}), opt=opt)
    for name, res in results.items():
        logger.info(f"{name}: {res}")
    return results
