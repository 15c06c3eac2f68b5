"""Optical-flow validation + submission harness (GMFlow).

TPU-native rebuild of archs/gmflow/evaluate.py:18-689. A `flow_fn`
replaces the torch model: it takes two (1, H, W, 3) float arrays in
[0, 255] (NHWC) and returns a (1, H, W, 2) flow — typically
`jax.jit(partial(GMFlow.apply, params, attn_splits=2, ...))`.

Padding to multiples of `padding_factor` mirrors the reference
InputPadder semantics (evaluate.py uses utils.utils.InputPadder with
'sintel'/'kitti' modes)."""
import os
import os.path as osp

import numpy as np

from comfyui_keep_tpu.data import flow_datasets as fdata


class InputPadder:
    """Pad (H, W) up to a multiple of `factor`. mode='sintel' pads evenly
    top/bottom+left/right; 'kitti' pads top and right only."""

    def __init__(self, shape, mode="sintel", padding_factor=8):
        self.ht, self.wd = shape[-3], shape[-2]  # NHWC
        pad_ht = (((self.ht // padding_factor) + 1) * padding_factor
                  - self.ht) % padding_factor
        pad_wd = (((self.wd // padding_factor) + 1) * padding_factor
                  - self.wd) % padding_factor
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *imgs):
        l, r, t, b = self._pad
        return [np.pad(im, ((0, 0), (t, b), (l, r), (0, 0))) for im in imgs]

    def unpad(self, flow):
        l, r, t, b = self._pad
        h, w = flow.shape[-3], flow.shape[-2]
        return flow[..., t:h - b, l:w - r, :]


def _epe_map(pred, gt):
    return np.sqrt(np.sum((pred - gt) ** 2, axis=-1))


def compute_out_of_boundary_mask(flow):
    """In-image-plane validity of GT correspondences (gmflow
    utils/utils.py:36-53). flow: (H, W, 2) channels-last -> (H, W) bool."""
    h, w = flow.shape[:2]
    xs = np.arange(w, dtype=np.float32)[None, :] + flow[..., 0]
    ys = np.arange(h, dtype=np.float32)[:, None] + flow[..., 1]
    valid = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    flow_ok = (np.abs(flow[..., 0]) <= w - 1) & (np.abs(flow[..., 1]) <= h - 1)
    return valid & flow_ok


def _bucket_mean(lst):
    return float(np.mean(np.concatenate(lst))) if lst else float("nan")


def _speed_buckets(epe, gt, s0, s1, s2):
    speed = np.sqrt(np.sum(gt ** 2, axis=-1))
    m = speed < 10
    if m.max() > 0:
        s0.append(epe[m])
    m = (speed >= 10) & (speed <= 40)
    if m.max() > 0:
        s1.append(epe[m])
    m = speed > 40
    if m.max() > 0:
        s2.append(epe[m])


def validate_chairs(flow_fn, root="datasets/FlyingChairs_release/data",
                    split_file=None, with_speed_metric=False, max_samples=None):
    """FlyingChairs validation EPE + outlier rates (evaluate.py:108-188)."""
    ds = fdata.FlyingChairs(split="validation", root=root,
                            split_file=split_file)
    epe_list, s0, s1, s2 = [], [], [], []
    n = len(ds) if max_samples is None else min(len(ds), max_samples)
    for i in range(n):
        s = ds[i]
        pred = np.asarray(flow_fn(s["img1"][None], s["img2"][None]))[0]
        epe = _epe_map(pred, s["flow"])
        epe_list.append(epe.reshape(-1))
        if with_speed_metric:
            _speed_buckets(epe, s["flow"], s0, s1, s2)
    epe_all = np.concatenate(epe_list)
    results = {"chairs_epe": float(np.mean(epe_all)),
               "chairs_1px": float(np.mean(epe_all > 1)),
               "chairs_3px": float(np.mean(epe_all > 3)),
               "chairs_5px": float(np.mean(epe_all > 5))}
    if with_speed_metric:
        results["chairs_s0_10"] = _bucket_mean(s0)
        results["chairs_s10_40"] = _bucket_mean(s1)
        results["chairs_s40+"] = _bucket_mean(s2)
    return results


def validate_things(flow_fn, root="datasets/FlyingThings3D",
                    dstype="frames_cleanpass", padding_factor=8,
                    max_val_flow=400, with_speed_metric=False,
                    max_samples=None):
    """FlyingThings3D test-subset validation (evaluate.py:190-284)."""
    ds = fdata.FlyingThings3D(root=root, dstype=dstype, test_set=True,
                              validate_subset=True)
    epe_list, s0, s1, s2 = [], [], [], []
    n = len(ds) if max_samples is None else min(len(ds), max_samples)
    for i in range(n):
        s = ds[i]
        padder = InputPadder(s["img1"][None].shape,
                             padding_factor=padding_factor)
        i1, i2 = padder.pad(s["img1"][None], s["img2"][None])
        pred = padder.unpad(np.asarray(flow_fn(i1, i2)))[0]
        gt = s["flow"]
        # exclude extremely large displacements (evaluate.py:243-248)
        mag = np.sqrt(np.sum(gt ** 2, axis=-1))
        mask = mag < max_val_flow
        if not mask.any():
            continue
        epe = _epe_map(pred, gt)[mask]
        epe_list.append(epe.reshape(-1))
        if with_speed_metric:
            _speed_buckets(_epe_map(pred, gt), gt, s0, s1, s2)
    epe_all = np.concatenate(epe_list)
    key = "things_clean" if dstype == "frames_cleanpass" else "things_final"
    results = {f"{key}_epe": float(np.mean(epe_all)),
               f"{key}_1px": float(np.mean(epe_all > 1)),
               f"{key}_3px": float(np.mean(epe_all > 3)),
               f"{key}_5px": float(np.mean(epe_all > 5))}
    if with_speed_metric:
        results[f"{key}_s0_10"] = _bucket_mean(s0)
        results[f"{key}_s10_40"] = _bucket_mean(s1)
        results[f"{key}_s40+"] = _bucket_mean(s2)
    return results


def validate_sintel(flow_fn, root="datasets/Sintel", dstype="clean",
                    padding_factor=8, with_speed_metric=False,
                    evaluate_matched_unmatched=False, max_samples=None):
    """Sintel train-split validation (evaluate.py:287-429). With
    evaluate_matched_unmatched, splits EPE by the occlusion masks."""
    ds = fdata.MpiSintel(split="training", root=root, dstype=dstype,
                         load_occlusion=evaluate_matched_unmatched)
    epe_list, matched, unmatched, s0, s1, s2 = [], [], [], [], [], []
    n = len(ds) if max_samples is None else min(len(ds), max_samples)
    for i in range(n):
        s = ds[i]
        padder = InputPadder(s["img1"][None].shape,
                             padding_factor=padding_factor)
        i1, i2 = padder.pad(s["img1"][None], s["img2"][None])
        pred = padder.unpad(np.asarray(flow_fn(i1, i2)))[0]
        epe = _epe_map(pred, s["flow"])
        epe_list.append(epe.reshape(-1))
        if evaluate_matched_unmatched:
            # matched = non-occluded AND flow stays in the image plane
            # (evaluate.py:326,362: noc_valid & compute_out_of_boundary_mask)
            noc = (s["noc_valid"] > 0.5) & compute_out_of_boundary_mask(
                s["flow"])
            if noc.any():
                matched.append(epe[noc])
            if (~noc).any():
                unmatched.append(epe[~noc])
        if with_speed_metric:
            _speed_buckets(epe, s["flow"], s0, s1, s2)
    epe_all = np.concatenate(epe_list)
    results = {f"sintel_{dstype}_epe": float(np.mean(epe_all)),
               f"sintel_{dstype}_1px": float(np.mean(epe_all > 1)),
               f"sintel_{dstype}_3px": float(np.mean(epe_all > 3)),
               f"sintel_{dstype}_5px": float(np.mean(epe_all > 5))}
    if evaluate_matched_unmatched:
        results[f"sintel_{dstype}_matched"] = \
            float(np.mean(np.concatenate(matched)))
        results[f"sintel_{dstype}_unmatched"] = \
            float(np.mean(np.concatenate(unmatched)))
    if with_speed_metric:
        results[f"sintel_{dstype}_s0_10"] = _bucket_mean(s0)
        results[f"sintel_{dstype}_s10_40"] = _bucket_mean(s1)
        results[f"sintel_{dstype}_s40+"] = _bucket_mean(s2)
    return results


def validate_kitti(flow_fn, root="datasets/KITTI", padding_factor=8,
                   with_speed_metric=False, max_samples=None):
    """KITTI-2015 validation: EPE + F1-all (evaluate.py:432-563)."""
    ds = fdata.KITTI(split="training", root=root)
    epe_list, out_list, s0, s1, s2 = [], [], [], [], []
    n = len(ds) if max_samples is None else min(len(ds), max_samples)
    for i in range(n):
        s = ds[i]
        padder = InputPadder(s["img1"][None].shape, mode="kitti",
                             padding_factor=padding_factor)
        i1, i2 = padder.pad(s["img1"][None], s["img2"][None])
        pred = padder.unpad(np.asarray(flow_fn(i1, i2)))[0]
        gt, valid = s["flow"], s["valid"] >= 0.5
        epe = _epe_map(pred, gt)
        mag = np.sqrt(np.sum(gt ** 2, axis=-1))
        # F1: outlier if EPE > 3px and > 5% of magnitude
        out = ((epe > 3.0) & ((epe / np.maximum(mag, 1e-9)) > 0.05))
        epe_list.append(epe[valid].mean())
        out_list.append(out[valid].reshape(-1))
        if with_speed_metric:
            _speed_buckets(np.where(valid, epe, np.nan), gt, s0, s1, s2)
    results = {"kitti_epe": float(np.mean(epe_list)),
               "kitti_f1": 100.0 * float(np.mean(np.concatenate(out_list)))}
    if with_speed_metric:
        results["kitti_s0_10"] = _bucket_mean(s0)
        results["kitti_s10_40"] = _bucket_mean(s1)
        results["kitti_s40+"] = _bucket_mean(s2)
    return results


def create_sintel_submission(flow_fn, root="datasets/Sintel",
                             output_path="sintel_submission", dstype="clean",
                             padding_factor=8):
    """Write .flo predictions for the Sintel test split
    (evaluate.py:18-65)."""
    ds = fdata.MpiSintel(split="test", root=root, dstype=dstype)
    for i in range(len(ds)):
        s = ds[i]
        scene, frame_id = s["extra_info"]
        padder = InputPadder(s["img1"][None].shape,
                             padding_factor=padding_factor)
        i1, i2 = padder.pad(s["img1"][None], s["img2"][None])
        flow = padder.unpad(np.asarray(flow_fn(i1, i2)))[0]
        out_dir = osp.join(output_path, dstype, scene)
        os.makedirs(out_dir, exist_ok=True)
        fdata.write_flo(osp.join(out_dir, "frame%04d.flo" % (frame_id + 1)),
                        flow)


def create_kitti_submission(flow_fn, root="datasets/KITTI",
                            output_path="kitti_submission",
                            padding_factor=8):
    """Write KITTI 16-bit png predictions (evaluate.py:68-105)."""
    ds = fdata.KITTI(split="testing", root=root)
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        (frame_id,) = s["extra_info"]
        padder = InputPadder(s["img1"][None].shape, mode="kitti",
                             padding_factor=padding_factor)
        i1, i2 = padder.pad(s["img1"][None], s["img2"][None])
        flow = padder.unpad(np.asarray(flow_fn(i1, i2)))[0]
        fdata.write_flow_kitti(osp.join(output_path, frame_id), flow)


def inference_on_dir(flow_fn, inference_dir, output_path="output",
                     padding_factor=8, save_flo_flow=False):
    """Run flow on consecutive image pairs in a directory
    (evaluate.py:566-689); returns list of predicted flows."""
    from comfyui_keep_tpu.utils.flow import flow_to_image
    from PIL import Image
    files = sorted(os.listdir(inference_dir))
    files = [osp.join(inference_dir, f) for f in files
             if f.lower().endswith((".png", ".jpg", ".jpeg", ".ppm"))]
    os.makedirs(output_path, exist_ok=True)
    flows = []
    for i in range(len(files) - 1):
        img1 = np.array(Image.open(files[i]).convert("RGB"), np.float32)
        img2 = np.array(Image.open(files[i + 1]).convert("RGB"), np.float32)
        padder = InputPadder(img1[None].shape, padding_factor=padding_factor)
        i1, i2 = padder.pad(img1[None], img2[None])
        flow = padder.unpad(np.asarray(flow_fn(i1, i2)))[0]
        flows.append(flow)
        viz = flow_to_image(flow)
        Image.fromarray(viz).save(osp.join(output_path, "%04d_flow.png" % i))
        if save_flo_flow:
            fdata.write_flo(osp.join(output_path, "%04d_pred.flo" % i), flow)
    return flows
