#!/usr/bin/env python
"""Test entry point (reference wm_basicsr/test.py CLI):

  python tools/test.py -opt options/test_keep.yml
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from comfyui_keep_tpu.utils.options import parse_options
    from comfyui_keep_tpu.training.train import test_pipeline
    opt, _ = parse_options(os.getcwd(), is_train=False)
    test_pipeline(opt)


if __name__ == "__main__":
    main()
