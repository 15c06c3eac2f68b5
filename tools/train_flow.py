#!/usr/bin/env python
"""GMFlow optical-flow training entry point (reference
archs/gmflow/main.py:20-557, TPU-native):

  python tools/train_flow.py --stage chairs --image_size 384 512 \
      --batch_size 8 --num_steps 100000 --lr 4e-4 \
      --chairs_root datasets/FlyingChairs_release/data \
      [--val_dataset chairs] [--resume ckpt.npz]
"""
import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="chairs",
                   choices=["chairs", "things", "sintel", "kitti"])
    p.add_argument("--image_size", type=int, nargs=2, default=[384, 512])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--attn_splits", type=int, default=2)
    p.add_argument("--corr_radius", type=int, default=-1)
    p.add_argument("--prop_radius", type=int, default=-1)
    p.add_argument("--chairs_root",
                   default="datasets/FlyingChairs_release/data")
    p.add_argument("--chairs_split_file", default=None)
    p.add_argument("--things_root", default="datasets/FlyingThings3D")
    p.add_argument("--sintel_root", default="datasets/Sintel")
    p.add_argument("--kitti_root", default="datasets/KITTI")
    p.add_argument("--hd1k_root", default="datasets/HD1K")
    p.add_argument("--val_dataset", default=None)
    p.add_argument("--val_freq", type=int, default=10000)
    p.add_argument("--save_freq", type=int, default=10000)
    p.add_argument("--checkpoint_dir", default="experiments/gmflow")
    p.add_argument("--resume", default=None)
    p.add_argument("--summary_freq", type=int, default=100)
    return p.parse_args()


def main():
    from comfyui_keep_tpu.utils.options import pin_platform_from_env
    pin_platform_from_env()
    import jax
    import numpy as np
    from functools import partial
    from comfyui_keep_tpu.data.flow_datasets import build_train_dataset
    from comfyui_keep_tpu.data.prefetch import DataLoader
    from comfyui_keep_tpu.training import flow_eval
    from comfyui_keep_tpu.training.state import (TrainState, load_network_npz,
                                                 save_npz)
    from comfyui_keep_tpu.training.trainers import build_model, _make_mesh
    from comfyui_keep_tpu.utils.logger import get_root_logger

    args = parse_args()
    logger = get_root_logger()
    roots = {"chairs": args.chairs_root, "things": args.things_root,
             "sintel": args.sintel_root, "kitti": args.kitti_root,
             "hd1k": args.hd1k_root}
    opt = {
        "model_type": "GMFlowModel",
        "network_g": {"attn_splits": args.attn_splits,
                      "corr_radius": args.corr_radius,
                      "prop_radius": args.prop_radius},
        "train": {"lr": args.lr, "weight_decay": args.weight_decay,
                  "grad_clip": args.grad_clip, "gamma": args.gamma,
                  "num_steps": args.num_steps},
    }
    mesh = _make_mesh() if len(jax.devices()) > 1 else None
    trainer = build_model(opt, mesh=mesh)
    state = trainer.make_state(jax.random.PRNGKey(0))
    if args.resume:
        state.params = load_network_npz(args.resume)
        logger.info(f"resumed weights from {args.resume}")

    ds = build_train_dataset(args.stage, tuple(args.image_size), roots=roots,
                             chairs_split_file=args.chairs_split_file)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        drop_last=True)
    logger.info(f"stage={args.stage} dataset={len(ds)} pairs")

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    step = 0
    while step < args.num_steps:
        for batch in loader:
            batch = {k: v for k, v in batch.items()
                     if k in ("img1", "img2", "flow", "valid")}
            state, logs = trainer.train_step(state, batch)
            step += 1
            if step % args.summary_freq == 0:
                logger.info(f"step {step}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in logs.items()))
            if step % args.save_freq == 0 or step == args.num_steps:
                path = os.path.join(args.checkpoint_dir,
                                    f"gmflow_{args.stage}_{step}.npz")
                save_npz(path, {"params": jax.tree.map(np.asarray,
                                                       state.params)})
                logger.info(f"saved {path}")
            if args.val_dataset and step % args.val_freq == 0:
                from comfyui_keep_tpu.models.gmflow import GMFlow
                fn = jax.jit(partial(GMFlow.apply, state.params,
                                     attn_splits=args.attn_splits,
                                     corr_radius=args.corr_radius,
                                     prop_radius=args.prop_radius))
                if args.val_dataset == "chairs":
                    res = flow_eval.validate_chairs(
                        fn, root=args.chairs_root,
                        split_file=args.chairs_split_file)
                elif args.val_dataset == "sintel":
                    res = flow_eval.validate_sintel(fn, root=args.sintel_root)
                else:
                    res = flow_eval.validate_kitti(fn, root=args.kitti_root)
                logger.info(f"val @{step}: {res}")
            if step >= args.num_steps:
                break


if __name__ == "__main__":
    main()
