"""Optical-flow training datasets + augmentation (GMFlow harness).

TPU-native rebuild of the reference GMFlow data stack
(archs/gmflow/data/datasets.py:16-291, data/transforms.py:7-290,
archs/gmflow/utils/frame_utils.py:1-137). Differences from the torch
original:

  * samples are NHWC numpy float32 (jax layout), not CHW torch tensors;
  * photometric jitter is a numpy re-implementation of
    torchvision.transforms.ColorJitter (same factor ranges, same
    brightness/contrast/saturation/hue semantics, random op order);
  * no torch DataLoader coupling — datasets are plain indexables usable
    with data.prefetch.DataLoader.
"""
import glob as _glob
import os
import os.path as osp
import re

import numpy as np

try:  # cv2 for KITTI 16-bit png IO + resize; PIL fallback where possible
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


# ---------------------------------------------------------------------------
# Flow file IO (frame_utils.py:1-137)
# ---------------------------------------------------------------------------

TAG_FLOAT = 202021.25  # .flo magic


def read_flo(path):
    """Middlebury .flo (frame_utils.py:10-29)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if len(magic) == 0 or magic[0] != np.float32(TAG_FLOAT):
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path, flow):
    """(H, W, 2) float32 -> .flo (frame_utils.py:70-100)."""
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([TAG_FLOAT], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path):
    """FlyingThings3D .pfm flow (frame_utils.py:32-67)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dim = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dim:
            raise ValueError("malformed PFM header")
        width, height = map(int, dim.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape))


def read_flow_kitti(path):
    """KITTI 16-bit png -> (flow (H,W,2), valid (H,W))
    (frame_utils.py:103-108)."""
    if not _HAVE_CV2:  # pragma: no cover
        raise RuntimeError("cv2 required for KITTI flow IO")
    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)  # BGR->RGB
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    return (flow - 2 ** 15) / 64.0, valid


def write_flow_kitti(path, flow):
    """(frame_utils.py:111-115)."""
    if not _HAVE_CV2:  # pragma: no cover
        raise RuntimeError("cv2 required for KITTI flow IO")
    uv = 64.0 * np.asarray(flow) + 2 ** 15
    valid = np.ones(uv.shape[:2] + (1,))
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_gen(path):
    """Image or flow file by extension -> numpy (frame_utils.py:118-137)."""
    ext = osp.splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".jpg", ".ppm"):
        from PIL import Image
        return np.array(Image.open(path))
    if ext == ".flo":
        return read_flo(path)
    if ext == ".pfm":
        flo = read_pfm(path).astype(np.float32)
        return flo if flo.ndim == 2 else flo[:, :, :-1]
    raise ValueError(f"unsupported extension {ext}")


# ---------------------------------------------------------------------------
# Photometric jitter (numpy ColorJitter; transforms.py:25 semantics)
# ---------------------------------------------------------------------------

class ColorJitterNP:
    """torchvision ColorJitter re-implementation on uint8 HWC numpy.

    Factors are drawn uniformly from [max(0, 1-x), 1+x] (hue from [-h, h])
    and the four ops are applied in random order, matching torchvision."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def _blend(a, b, f):
        return np.clip(f * a + (1.0 - f) * b, 0, 255)

    def __call__(self, img):
        img = img.astype(np.float32)
        ops = list(range(4))
        np.random.shuffle(ops)
        for op in ops:
            if op == 0 and self.brightness > 0:
                f = np.random.uniform(max(0, 1 - self.brightness),
                                      1 + self.brightness)
                img = np.clip(img * f, 0, 255)
            elif op == 1 and self.contrast > 0:
                f = np.random.uniform(max(0, 1 - self.contrast),
                                      1 + self.contrast)
                gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] +
                        0.114 * img[..., 2]).mean()
                img = self._blend(img, gray, f)
            elif op == 2 and self.saturation > 0:
                f = np.random.uniform(max(0, 1 - self.saturation),
                                      1 + self.saturation)
                gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] +
                        0.114 * img[..., 2])[..., None]
                img = self._blend(img, gray, f)
            elif op == 3 and self.hue > 0:
                f = np.random.uniform(-self.hue, self.hue)
                if _HAVE_CV2:
                    hsv = cv2.cvtColor(img.astype(np.uint8),
                                       cv2.COLOR_RGB2HSV_FULL)
                    h = hsv[..., 0].astype(np.int32) + int(round(f * 255))
                    hsv[..., 0] = (h % 256).astype(np.uint8)
                    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB_FULL)
                    img = img.astype(np.float32)
        return img.round().astype(np.uint8)


# ---------------------------------------------------------------------------
# Augmentors (transforms.py:7-290)
# ---------------------------------------------------------------------------

class FlowAugmentor:
    """Dense-flow augmentation (transforms.py:7-149)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=True,
                 no_eraser_aug=True):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.photo_aug = ColorJitterNP(0.4, 0.4, 0.4, 0.5 / 3.14)
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = -1 if no_eraser_aug else 0.5

    def color_transform(self, img1, img2):
        if np.random.rand() < self.asymmetric_color_aug_prob:
            return self.photo_aug(img1), self.photo_aug(img2)
        stack = self.photo_aug(np.concatenate([img1, img2], axis=0))
        a, b = np.split(stack, 2, axis=0)
        return a, b

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        if np.random.rand() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            for _ in range(np.random.randint(1, 3)):
                x0 = np.random.randint(0, wd)
                y0 = np.random.randint(0, ht)
                dx = np.random.randint(bounds[0], bounds[1])
                dy = np.random.randint(bounds[0], bounds[1])
                img2 = img2.copy()
                img2[y0:y0 + dy, x0:x0 + dx, :] = mean_color
        return img1, img2

    def spatial_transform(self, img1, img2, flow, occlusion=None):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum((self.crop_size[0] + 8) / float(ht),
                               (self.crop_size[1] + 8) / float(wd))
        scale = 2 ** np.random.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if np.random.rand() < self.stretch_prob:
            scale_x *= 2 ** np.random.uniform(-self.max_stretch, self.max_stretch)
            scale_y *= 2 ** np.random.uniform(-self.max_stretch, self.max_stretch)
        scale_x = np.clip(scale_x, min_scale, None)
        scale_y = np.clip(scale_y, min_scale, None)

        if np.random.rand() < self.spatial_aug_prob:
            img1 = cv2.resize(img1, None, fx=scale_x, fy=scale_y,
                              interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=scale_x, fy=scale_y,
                              interpolation=cv2.INTER_LINEAR)
            flow = cv2.resize(flow, None, fx=scale_x, fy=scale_y,
                              interpolation=cv2.INTER_LINEAR)
            flow = flow * [scale_x, scale_y]
            if occlusion is not None:
                occlusion = cv2.resize(occlusion, None, fx=scale_x, fy=scale_y,
                                       interpolation=cv2.INTER_LINEAR)

        if self.do_flip:
            if np.random.rand() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
                if occlusion is not None:
                    occlusion = occlusion[:, ::-1]
            if np.random.rand() < self.v_flip_prob:
                img1, img2 = img1[::-1, :], img2[::-1, :]
                flow = flow[::-1, :] * [1.0, -1.0]
                if occlusion is not None:
                    occlusion = occlusion[::-1, :]

        y0 = np.random.randint(0, img1.shape[0] - self.crop_size[0]) \
            if img1.shape[0] > self.crop_size[0] else 0
        x0 = np.random.randint(0, img1.shape[1] - self.crop_size[1]) \
            if img1.shape[1] > self.crop_size[1] else 0
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        if occlusion is not None:
            return img1[sl], img2[sl], flow[sl], occlusion[sl]
        return img1[sl], img2[sl], flow[sl]

    def __call__(self, img1, img2, flow, occlusion=None):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        out = self.spatial_transform(img1, img2, flow, occlusion)
        return tuple(np.ascontiguousarray(x) for x in out)


class SparseFlowAugmentor:
    """KITTI/HD1K sparse-flow augmentation (transforms.py:152-290)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False,
                 no_eraser_aug=True):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.do_flip = do_flip
        self.photo_aug = ColorJitterNP(0.3, 0.3, 0.3, 0.3 / 3.14)
        self.eraser_aug_prob = -1 if no_eraser_aug else 0.5

    def color_transform(self, img1, img2):
        stack = self.photo_aug(np.concatenate([img1, img2], axis=0))
        a, b = np.split(stack, 2, axis=0)
        return a, b

    eraser_transform = FlowAugmentor.eraser_transform

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        """Nearest scatter of valid flow vectors (transforms.py:198-230)."""
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)),
                          axis=-1).reshape(-1, 2).astype(np.float32)
        flow = flow.reshape(-1, 2).astype(np.float32)
        valid = valid.reshape(-1).astype(np.float32)
        coords0, flow0 = coords[valid >= 1], flow[valid >= 1]
        ht1, wd1 = int(round(ht * fy)), int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]
        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        v = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        flow_img = np.zeros([ht1, wd1, 2], np.float32)
        valid_img = np.zeros([ht1, wd1], np.int32)
        flow_img[yy[v], xx[v]] = flow1[v]
        valid_img[yy[v], xx[v]] = 1
        return flow_img, valid_img

    def spatial_transform(self, img1, img2, flow, valid):
        ht, wd = img1.shape[:2]
        min_scale = np.maximum((self.crop_size[0] + 1) / float(ht),
                               (self.crop_size[1] + 1) / float(wd))
        scale = 2 ** np.random.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = np.clip(scale, min_scale, None)
        if np.random.rand() < self.spatial_aug_prob:
            img1 = cv2.resize(img1, None, fx=scale_x, fy=scale_y,
                              interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=scale_x, fy=scale_y,
                              interpolation=cv2.INTER_LINEAR)
            flow, valid = self.resize_sparse_flow_map(flow, valid,
                                                      fx=scale_x, fy=scale_y)
        if self.do_flip and np.random.rand() < 0.5:
            img1, img2 = img1[:, ::-1], img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
            valid = valid[:, ::-1]
        margin_y, margin_x = 20, 50
        y0 = np.random.randint(0, img1.shape[0] - self.crop_size[0] + margin_y)
        x0 = np.random.randint(-margin_x,
                               img1.shape[1] - self.crop_size[1] + margin_x)
        y0 = int(np.clip(y0, 0, img1.shape[0] - self.crop_size[0]))
        x0 = int(np.clip(x0, 0, img1.shape[1] - self.crop_size[1]))
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl], valid[sl]

    def __call__(self, img1, img2, flow, valid):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(img1, img2, flow, valid)
        return tuple(np.ascontiguousarray(x)
                     for x in (img1, img2, flow, valid))


# ---------------------------------------------------------------------------
# Datasets (datasets.py:16-291)
# ---------------------------------------------------------------------------

class FlowDataset:
    """Base pair dataset. __getitem__ -> dict with NHWC float32 arrays:
    img1/img2 (H,W,3) in [0,255], flow (H,W,2), valid (H,W)
    (datasets.py:16-126; torch CHW tensors become HWC numpy)."""

    def __init__(self, aug_params=None, sparse=False, load_occlusion=False):
        self.augmentor = None
        self.sparse = sparse
        if aug_params is not None:
            cls = SparseFlowAugmentor if sparse else FlowAugmentor
            self.augmentor = cls(**aug_params)
        self.is_test = False
        self.flow_list = []
        self.image_list = []
        self.extra_info = []
        self.load_occlusion = load_occlusion
        self.occ_list = []

    def __getitem__(self, index):
        if self.is_test:
            img1 = np.array(read_gen(self.image_list[index][0]),
                            np.uint8)[..., :3]
            img2 = np.array(read_gen(self.image_list[index][1]),
                            np.uint8)[..., :3]
            return {"img1": img1.astype(np.float32),
                    "img2": img2.astype(np.float32),
                    "extra_info": self.extra_info[index]}

        index = index % len(self.image_list)
        valid = None
        if self.sparse:
            flow, valid = read_flow_kitti(self.flow_list[index])
        else:
            flow = read_gen(self.flow_list[index])
        occlusion = None
        if self.load_occlusion:
            occlusion = np.array(read_gen(self.occ_list[index]), np.float32)

        img1 = np.array(read_gen(self.image_list[index][0]), np.uint8)
        img2 = np.array(read_gen(self.image_list[index][1]), np.uint8)
        flow = np.array(flow, np.float32)
        if img1.ndim == 2:
            img1 = np.tile(img1[..., None], (1, 1, 3))
            img2 = np.tile(img2[..., None], (1, 1, 3))
        else:
            img1, img2 = img1[..., :3], img2[..., :3]

        if self.augmentor is not None:
            if self.sparse:
                img1, img2, flow, valid = self.augmentor(img1, img2, flow, valid)
            elif self.load_occlusion:
                img1, img2, flow, occlusion = self.augmentor(
                    img1, img2, flow, occlusion=occlusion)
            else:
                img1, img2, flow = self.augmentor(img1, img2, flow)

        if valid is None:
            valid = ((np.abs(flow[..., 0]) < 1000) &
                     (np.abs(flow[..., 1]) < 1000))
        out = {"img1": img1.astype(np.float32),
               "img2": img2.astype(np.float32),
               "flow": flow.astype(np.float32),
               "valid": np.asarray(valid, np.float32)}
        if self.load_occlusion:
            out["noc_valid"] = 1.0 - occlusion / 255.0
        return out

    def __rmul__(self, v):
        self.flow_list = v * self.flow_list
        self.image_list = v * self.image_list
        return self

    def __len__(self):
        return len(self.image_list)


class MpiSintel(FlowDataset):
    """(datasets.py:129-158)."""

    def __init__(self, aug_params=None, split="training",
                 root="datasets/Sintel", dstype="clean", load_occlusion=False):
        super().__init__(aug_params, load_occlusion=load_occlusion)
        flow_root = osp.join(root, split, "flow")
        image_root = osp.join(root, split, dstype)
        occ_root = osp.join(root, split, "occlusions")
        if split == "test":
            self.is_test = True
        for scene in sorted(os.listdir(image_root)):
            images = sorted(_glob.glob(osp.join(image_root, scene, "*.png")))
            for i in range(len(images) - 1):
                self.image_list += [[images[i], images[i + 1]]]
                self.extra_info += [(scene, i)]
            if split != "test":
                self.flow_list += sorted(
                    _glob.glob(osp.join(flow_root, scene, "*.flo")))
                if load_occlusion:
                    self.occ_list += sorted(
                        _glob.glob(osp.join(occ_root, scene, "*.png")))


class FlyingChairs(FlowDataset):
    """(datasets.py:161-177). The official chairs_split.txt (1=train,
    2=validation) is passed via split_file; without one, every 10th pair is
    validation (deterministic fallback — the split file is not
    redistributable here)."""

    def __init__(self, aug_params=None, split="train",
                 root="datasets/FlyingChairs_release/data", split_file=None):
        super().__init__(aug_params)
        images = sorted(_glob.glob(osp.join(root, "*.ppm")))
        flows = sorted(_glob.glob(osp.join(root, "*.flo")))
        assert len(images) // 2 == len(flows)
        if split_file and osp.isfile(split_file):
            split_list = np.loadtxt(split_file, dtype=np.int32)
        else:
            split_list = np.ones(len(flows), np.int32)
            split_list[::10] = 2
        want = 1 if split in ("train", "training") else 2
        for i in range(len(flows)):
            if split_list[i] == want:
                self.flow_list += [flows[i]]
                self.image_list += [[images[2 * i], images[2 * i + 1]]]


class FlyingThings3D(FlowDataset):
    """(datasets.py:180-227)."""

    def __init__(self, aug_params=None, root="datasets/FlyingThings3D",
                 dstype="frames_cleanpass", test_set=False,
                 validate_subset=True):
        super().__init__(aug_params)
        part = "TEST" if test_set else "TRAIN"
        for cam in ["left"]:
            for direction in ["into_future", "into_past"]:
                image_dirs = sorted(
                    _glob.glob(osp.join(root, dstype, part, "*/*")))
                image_dirs = sorted(osp.join(f, cam) for f in image_dirs)
                flow_dirs = sorted(
                    _glob.glob(osp.join(root, "optical_flow", part, "*/*")))
                flow_dirs = sorted(osp.join(f, direction, cam)
                                   for f in flow_dirs)
                for idir, fdir in zip(image_dirs, flow_dirs):
                    images = sorted(_glob.glob(osp.join(idir, "*.png")))
                    flows = sorted(_glob.glob(osp.join(fdir, "*.pfm")))
                    for i in range(len(flows) - 1):
                        if direction == "into_future":
                            self.image_list += [[images[i], images[i + 1]]]
                            self.flow_list += [flows[i]]
                        else:
                            self.image_list += [[images[i + 1], images[i]]]
                            self.flow_list += [flows[i + 1]]
        if test_set and validate_subset and len(self.image_list) > 1024:
            stride = len(self.image_list) // 1024
            remove = len(self.image_list) % 1024
            self.image_list = self.image_list[:-remove][::stride] \
                if remove else self.image_list[::stride]
            self.flow_list = self.flow_list[:-remove][::stride] \
                if remove else self.flow_list[::stride]


class KITTI(FlowDataset):
    """(datasets.py:230-249)."""

    def __init__(self, aug_params=None, split="training",
                 root="datasets/KITTI"):
        super().__init__(aug_params, sparse=True)
        if split == "testing":
            self.is_test = True
        root = osp.join(root, split)
        images1 = sorted(_glob.glob(osp.join(root, "image_2/*_10.png")))
        images2 = sorted(_glob.glob(osp.join(root, "image_2/*_11.png")))
        for img1, img2 in zip(images1, images2):
            self.extra_info += [[osp.basename(img1)]]
            self.image_list += [[img1, img2]]
        if split == "training":
            self.flow_list = sorted(_glob.glob(osp.join(root, "flow_occ/*_10.png")))


class HD1K(FlowDataset):
    """(datasets.py:252-268)."""

    def __init__(self, aug_params=None, root="datasets/HD1K"):
        super().__init__(aug_params, sparse=True)
        seq_ix = 0
        while True:
            flows = sorted(_glob.glob(osp.join(
                root, "hd1k_flow_gt", "flow_occ/%06d_*.png" % seq_ix)))
            images = sorted(_glob.glob(osp.join(
                root, "hd1k_input", "image_2/%06d_*.png" % seq_ix)))
            if not flows:
                break
            for i in range(len(flows) - 1):
                self.flow_list += [flows[i]]
                self.image_list += [[images[i], images[i + 1]]]
            seq_ix += 1


def build_train_dataset(stage, image_size=(384, 512), roots=None,
                        chairs_split_file=None):
    """Stage-wise dataset mix (datasets.py:271-291): 'chairs', 'things',
    'sintel' (things + 100*sintel_clean+final + 200*kitti + 5*hd1k),
    'kitti'."""
    roots = roots or {}
    if stage == "chairs":
        aug = dict(crop_size=image_size, min_scale=-0.1, max_scale=1.0,
                   do_flip=True)
        return FlyingChairs(aug, split="training",
                            root=roots.get("chairs",
                                           "datasets/FlyingChairs_release/data"),
                            split_file=chairs_split_file)
    if stage == "things":
        aug = dict(crop_size=image_size, min_scale=-0.4, max_scale=0.8,
                   do_flip=True)
        root = roots.get("things", "datasets/FlyingThings3D")
        clean = FlyingThings3D(aug, root=root, dstype="frames_cleanpass")
        final = FlyingThings3D(aug, root=root, dstype="frames_finalpass")
        return ConcatFlowDataset([clean, final])
    if stage == "sintel":
        aug = dict(crop_size=image_size, min_scale=-0.2, max_scale=0.6,
                   do_flip=True)
        things = FlyingThings3D(aug, root=roots.get("things",
                                                    "datasets/FlyingThings3D"),
                                dstype="frames_cleanpass")
        sintel_root = roots.get("sintel", "datasets/Sintel")
        clean = 100 * MpiSintel(aug, split="training", root=sintel_root,
                                dstype="clean")
        final = 100 * MpiSintel(aug, split="training", root=sintel_root,
                                dstype="final")
        kitti = 200 * KITTI(dict(crop_size=image_size, min_scale=-0.3,
                                 max_scale=0.5, do_flip=True),
                            root=roots.get("kitti", "datasets/KITTI"))
        hd1k = 5 * HD1K(dict(crop_size=image_size, min_scale=-0.5,
                             max_scale=0.2, do_flip=True),
                        root=roots.get("hd1k", "datasets/HD1K"))
        return ConcatFlowDataset([clean, final, kitti, hd1k, things])
    if stage == "kitti":
        aug = dict(crop_size=image_size, min_scale=-0.2, max_scale=0.4,
                   do_flip=False)
        return KITTI(aug, split="training",
                     root=roots.get("kitti", "datasets/KITTI"))
    raise ValueError(f"unknown stage {stage}")


class ConcatFlowDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self.cum = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, index):
        i = int(np.searchsorted(self.cum, index, side="right"))
        prev = 0 if i == 0 else int(self.cum[i - 1])
        return self.datasets[i][index - prev]
