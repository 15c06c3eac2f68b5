#!/usr/bin/env python
"""Training entry point (reference wm_basicsr/train.py CLI):

  python tools/train.py -opt options/train_keep.yml [--auto_resume] [--debug] \
      [--launcher jax] [--force_yml train:total_iter=100]
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from comfyui_keep_tpu.utils.options import parse_options
    from comfyui_keep_tpu.training.train import train_pipeline
    opt, _ = parse_options(os.getcwd(), is_train=True)
    train_pipeline(opt)


if __name__ == "__main__":
    main()
