"""Face crop/restore/paste orchestrator — rebuild of reference
wm_facelib/utils/face_restoration_helper.py:18-484.

Host-side geometry (similarity solve, warpAffine, mask morphology) stays on
numpy/cv2 — it is microseconds per face and exactness vs OpenCV matters for
parity. The neural pieces (detector, parser) are pluggable device functions:

  detector(img_bgr_u8, conf_threshold) -> (N, 15) [x1,y1,x2,y2,score,lm x10]
  parser(face_rgb_pm1 (1,512,512,3))   -> (1,512,512,19) class logits
"""
from typing import Callable, List, Optional

import numpy as np

try:
    import cv2
    _HAVE_CV2 = True
except ImportError:  # pragma: no cover
    _HAVE_CV2 = False

from comfyui_keep_tpu.utils.image import (bgr_u8_to_rgb_pm1, is_gray, bgr2gray,
                                          adain_npy)

# FFHQ 5-point template for 512 crops (face_restoration_helper.py:52-54)
FFHQ_TEMPLATE_512 = np.array([
    [192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
    [201.26117, 371.41043], [313.08905, 371.15118]], dtype=np.float64)

# parse-class keep mask: background/neck/ears/hat excluded
# (face_restoration_helper.py:430)
MASK_COLORMAP = [0, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
                 255, 255, 0, 255, 0, 0, 0]



def _warp_affine(img, m, dsize, border_mode="constant", border_value=None,
                 flags_nearest=False):
    """cv2.warpAffine when available, else the native C++ warp
    (native/src/pixel_ops.cpp warp_affine_bilinear_f32)."""
    if _HAVE_CV2:
        kw = {}
        if border_value is not None:
            kw["borderValue"] = border_value
        if border_mode == "replicate":
            kw["borderMode"] = cv2.BORDER_REPLICATE
        elif border_mode == "reflect101":
            kw["borderMode"] = cv2.BORDER_REFLECT101
        if flags_nearest:
            kw["flags"] = cv2.INTER_NEAREST
        return cv2.warpAffine(img, m, tuple(dsize), **kw)
    from comfyui_keep_tpu.native import warp_affine_native
    out = warp_affine_native(img, m, dsize, border_mode=border_mode,
                             border_value=border_value)
    if out is None:
        raise RuntimeError("no cv2 and native pixel_ops unavailable")
    return out


def similarity_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares 4-DOF similarity (scale/rotation/translation) mapping
    src -> dst; 2x3 matrix. Equivalent to cv2.estimateAffinePartial2D's
    model (the LMEDS robust loop is a no-op for 5 clean landmark points)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mean_s = src.mean(0)
    mean_d = dst.mean(0)
    src_c = src - mean_s
    dst_c = dst - mean_d
    # solve for [a, b]: [[a, -b], [b, a]]
    denom = (src_c ** 2).sum()
    a = (src_c * dst_c).sum() / denom
    b = (src_c[:, 0] * dst_c[:, 1] - src_c[:, 1] * dst_c[:, 0]).sum() / denom
    rot = np.array([[a, -b], [b, a]])
    t = mean_d - rot @ mean_s
    return np.concatenate([rot, t[:, None]], axis=1)


def estimate_affine(landmark: np.ndarray, template: np.ndarray) -> Optional[np.ndarray]:
    if _HAVE_CV2:
        m = cv2.estimateAffinePartial2D(landmark, template, method=cv2.LMEDS)[0]
        if m is not None:
            return m
    return similarity_transform(landmark, template)


def invert_affine(m: np.ndarray) -> np.ndarray:
    rot = m[:, :2]
    t = m[:, 2]
    inv_rot = np.linalg.inv(rot)
    return np.concatenate([inv_rot, (-inv_rot @ t)[:, None]], axis=1)


class FaceRestoreHelper:
    def __init__(self, upscale_factor: float = 1, face_size: int = 512,
                 crop_ratio=(1, 1), detector: Optional[Callable] = None,
                 parser: Optional[Callable] = None, use_parse: bool = True,
                 pad_blur: bool = False, template_3points: bool = False):
        assert _HAVE_CV2, "FaceRestoreHelper requires cv2 for host warps"
        self.upscale_factor = int(upscale_factor)
        self.crop_ratio = crop_ratio
        self.face_size = (int(face_size * crop_ratio[1]), int(face_size * crop_ratio[0]))
        self.detector = detector
        self.parser = parser
        self.use_parse = use_parse
        self.pad_blur = pad_blur
        if template_3points:
            self.face_template = np.array([[192, 240], [319, 240], [257, 371]],
                                          np.float64)
        else:
            self.face_template = FFHQ_TEMPLATE_512.copy()
        self.face_template *= face_size / 512.0
        if crop_ratio[0] > 1:
            self.face_template[:, 1] += face_size * (crop_ratio[0] - 1) / 2
        if crop_ratio[1] > 1:
            self.face_template[:, 0] += face_size * (crop_ratio[1] - 1) / 2
        self.is_gray = False
        self.clean_all()

    def clean_all(self):
        self.all_landmarks_5: List[np.ndarray] = []
        self.det_faces: List[np.ndarray] = []
        self.affine_matrices: List[Optional[np.ndarray]] = []
        self.inverse_affine_matrices: List[Optional[np.ndarray]] = []
        self.cropped_faces: List[np.ndarray] = []
        self.restored_faces: List[np.ndarray] = []
        self.pad_input_imgs: List[np.ndarray] = []

    # -- input ----------------------------------------------------------------

    def read_image(self, img):
        """16-bit / gray / alpha handling + min-side-512 upscale
        (face_restoration_helper.py:172-184)."""
        if isinstance(img, str):
            img = cv2.imread(img)
        img = np.asarray(img)
        if img.max() > 256:
            img = img / 65535 * 255
        if img.ndim == 2:
            img = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        self.input_img = img
        self.is_gray = is_gray(img, threshold=10)
        if min(self.input_img.shape[:2]) < 512:
            f = 512.0 / min(self.input_img.shape[:2])
            self.input_img = cv2.resize(self.input_img, (0, 0), fx=f, fy=f,
                                        interpolation=cv2.INTER_LINEAR)

    # -- detection ------------------------------------------------------------

    @staticmethod
    def get_center_face(det_faces, h=0, w=0, center=None):
        if not det_faces:
            return None, -1
        center = np.array(center) if center is not None else np.array([w / 2, h / 2])
        dists = [np.linalg.norm(np.array([(f[0] + f[2]) / 2, (f[1] + f[3]) / 2]) - center)
                 for f in det_faces]
        idx = int(np.argmin(dists))
        return det_faces[idx], idx

    @staticmethod
    def get_largest_face(det_faces, h, w):
        """Largest image-clipped box area (face_restoration_helper.py:133-151)."""
        if not det_faces:
            return None, -1
        clip = lambda v, length: min(max(v, 0), length)
        areas = [(clip(f[2], w) - clip(f[0], w)) * (clip(f[3], h) - clip(f[1], h))
                 for f in det_faces]
        idx = int(np.argmax(areas))
        return det_faces[idx], idx

    def set_upscale_factor(self, upscale_factor):
        self.upscale_factor = upscale_factor

    @staticmethod
    def resize_for_detection(img, resize=640):
        """Short-side cap before detection (face_restoration_helper.py:
        212-223). Returns (resized_img, scale_back)."""
        h, w = img.shape[:2]
        if resize is not None and min(h, w) > resize:
            scale = resize / min(h, w)
            hw = (int(w * scale), int(h * scale))
            interp = cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR
            small = cv2.resize(img, hw, interpolation=interp)
            return small, h / small.shape[0]
        return img, 1.0

    @staticmethod
    def select_landmarks_5(bboxes, img_hw, only_center_face=False,
                           eye_dist_threshold=None):
        """Eye-distance filter + center-face selection over (N, 15) rows
        (face_restoration_helper.py:225-255). Returns (landmarks, det_faces)
        lists (empty when nothing survives)."""
        landmarks, det_faces = [], []
        for bbox in np.asarray(bboxes):
            landmark = bbox[5:].reshape(5, 2)
            if eye_dist_threshold is not None:
                if np.linalg.norm(landmark[0] - landmark[1]) < eye_dist_threshold:
                    continue
            landmarks.append(landmark)
            det_faces.append(bbox[:5])
        if not det_faces:
            return [], []
        if only_center_face:
            h, w = img_hw
            face, idx = FaceRestoreHelper.get_center_face(det_faces, h, w)
            if idx == -1:
                return [], []
            return [landmarks[idx]], [face]
        return landmarks, det_faces

    def get_face_landmarks_5(self, only_center_face=False, resize=640,
                             eye_dist_threshold=None, conf_threshold=0.97):
        if self.detector is None:
            raise RuntimeError("no face detector attached")
        img, scale_back = self.resize_for_detection(self.input_img, resize)
        bboxes = self.detector(img, conf_threshold)
        if bboxes is None or len(bboxes) == 0:
            return 0
        bboxes = np.asarray(bboxes) * scale_back
        landmarks, det_faces = self.select_landmarks_5(
            bboxes, self.input_img.shape[:2],
            only_center_face=only_center_face,
            eye_dist_threshold=eye_dist_threshold)
        if not det_faces:
            return 0
        self.det_faces = det_faces
        self.all_landmarks_5 = landmarks
        return len(self.all_landmarks_5)

    # -- alignment ------------------------------------------------------------

    def _pad_blur_image(self, landmarks: np.ndarray) -> np.ndarray:
        """Reflect-pad + edge-blur + median-fade the input around the FFHQ
        oriented quad of one face (face_restoration_helper.py:259-302,
        blur_ratio hardcoded 0.01)."""
        eye_left, eye_right = landmarks[0, :], landmarks[1, :]
        eye_avg = (eye_left + eye_right) * 0.5
        mouth_avg = (landmarks[3, :] + landmarks[4, :]) * 0.5
        eye_to_eye = eye_right - eye_left
        eye_to_mouth = mouth_avg - eye_avg
        x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
        x /= np.hypot(*x)
        rect_scale = 1.5
        x *= max(np.hypot(*eye_to_eye) * 2.0 * rect_scale,
                 np.hypot(*eye_to_mouth) * 1.8 * rect_scale)
        y = np.flipud(x) * [-1, 1]
        c = eye_avg + eye_to_mouth * 0.1
        quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
        qsize = np.hypot(*x) * 2
        border = max(int(np.rint(qsize * 0.1)), 3)
        pad = ([int(np.floor(min(quad[:, i]))) for i in range(2)]
               + [int(np.ceil(max(quad[:, i]))) for i in range(2)])
        pad = [max(-pad[0] + border, 1),
               max(-pad[1] + border, 1),
               max(pad[2] - self.input_img.shape[1] + border, 1),
               max(pad[3] - self.input_img.shape[0] + border, 1)]
        if max(pad) <= 1:
            return np.copy(self.input_img)
        pad_img = np.pad(self.input_img,
                         ((pad[1], pad[3]), (pad[0], pad[2]), (0, 0)),
                         "reflect")
        h_pad, w_pad, _ = pad_img.shape
        y_grid, x_grid = np.ogrid[:h_pad, :w_pad]
        mask = np.maximum(
            1.0 - np.minimum(np.float32(x_grid) / pad[0],
                             np.float32(w_pad - 1 - x_grid) / pad[2]),
            1.0 - np.minimum(np.float32(y_grid) / pad[1],
                             np.float32(h_pad - 1 - y_grid) / pad[3]))
        blur = int(qsize * 0.01)
        if blur % 2 == 0:
            blur += 1
        blur_img = cv2.boxFilter(pad_img, 0, ksize=(blur, blur))
        pad_img = pad_img.astype("float32")
        pad_img += (blur_img - pad_img) * np.clip(
            mask[:, :, np.newaxis] * 3.0 + 1.0, 0.0, 1.0)
        pad_img += (np.median(pad_img, axis=(0, 1)) - pad_img) * np.clip(
            mask[:, :, np.newaxis], 0.0, 1.0)
        return np.clip(pad_img, 0, 255).astype(np.uint8)

    def align_warp_face(self, border_mode="constant"):
        """LMEDS similarity solve -> 512x512 warp with the FFHQ gray border
        (135,133,132) (face_restoration_helper.py:257-324); optional
        pad_blur pre-pads each face's source image."""
        border = {"constant": cv2.BORDER_CONSTANT,
                  "reflect101": cv2.BORDER_REFLECT101,
                  "reflect": cv2.BORDER_REFLECT}[border_mode]
        if self.pad_blur:
            # keep the landmarks' native dtype: the pad geometry's floor/ceil
            # must round exactly like the reference's arithmetic
            self.pad_input_imgs = [self._pad_blur_image(np.asarray(lm))
                                   for lm in self.all_landmarks_5]
        for idx, landmark in enumerate(self.all_landmarks_5):
            src = (self.pad_input_imgs[idx]
                   if self.pad_blur and idx < len(self.pad_input_imgs)
                   else self.input_img)
            m = estimate_affine(landmark, self.face_template)
            if m is None:
                self.cropped_faces.append(
                    np.zeros((self.face_size[1], self.face_size[0], 3), np.uint8))
                self.affine_matrices.append(None)
                continue
            self.affine_matrices.append(m)
            cropped = cv2.warpAffine(src, m, self.face_size,
                                     borderMode=border,
                                     borderValue=(135, 133, 132)) \
                if _HAVE_CV2 else _warp_affine(
                    src, m, self.face_size,
                    border_mode=border_mode, border_value=(135, 133, 132))
            self.cropped_faces.append(cropped)

    def get_inverse_affine(self):
        self.inverse_affine_matrices = []
        for m in self.affine_matrices:
            if m is None:
                self.inverse_affine_matrices.append(None)
                continue
            self.inverse_affine_matrices.append(invert_affine(m) * self.upscale_factor)

    def add_restored_face(self, restored_face, input_face=None):
        if self.is_gray:
            restored_face = bgr2gray(restored_face)
            if input_face is not None:
                restored_face = adain_npy(restored_face, input_face)
        self.restored_faces.append(restored_face)

    # -- paste-back -----------------------------------------------------------

    def _parse_soft_mask(self, face_bgr_u8: np.ndarray) -> np.ndarray:
        """ParseNet 19-class mask -> double-blurred soft mask in [0,1]
        (face_restoration_helper.py:417-442)."""
        face512 = cv2.resize(face_bgr_u8, (512, 512), interpolation=cv2.INTER_LINEAR)
        x = bgr_u8_to_rgb_pm1(face512)[None]
        logits = np.asarray(self.parser(x))[0]
        classes = logits.argmax(axis=-1)
        mask = np.zeros(classes.shape, np.float32)
        for idx, v in enumerate(MASK_COLORMAP):
            mask[classes == idx] = v
        mask = cv2.GaussianBlur(mask, (101, 101), 11)
        mask = cv2.GaussianBlur(mask, (101, 101), 11)
        thres = 10
        mask[:thres, :] = 0
        mask[-thres:, :] = 0
        mask[:, :thres] = 0
        mask[:, -thres:] = 0
        return mask / 255.0

    def paste_faces_to_input_image(self, upsample_img=None, draw_box=False,
                                   face_upsampler=None):
        h, w, _ = self.input_img.shape
        h_up, w_up = int(h * self.upscale_factor), int(w * self.upscale_factor)
        if upsample_img is None:
            upsample_img = cv2.resize(self.input_img, (w_up, h_up),
                                      interpolation=cv2.INTER_LINEAR)
        elif upsample_img.shape[:2] != (h_up, w_up):
            upsample_img = cv2.resize(upsample_img, (w_up, h_up),
                                      interpolation=cv2.INTER_LANCZOS4)
        upsample_img = upsample_img.astype(np.float32)

        borders = []
        for face, inv_m in zip(self.restored_faces, self.inverse_affine_matrices):
            if inv_m is None:
                continue
            face = face.copy()
            if face_upsampler is not None:
                up = face_upsampler(face)
                face = cv2.resize(up, self.face_size,
                                  interpolation=cv2.INTER_LANCZOS4)
            fh, fw = face.shape[:2]

            inv_restored = _warp_affine(face, inv_m, (w_up, h_up))
            mask = np.ones((fh, fw), np.float32)
            inv_mask = _warp_affine(mask, inv_m, (w_up, h_up))
            k = int(2 * self.upscale_factor)
            inv_mask_erosion = cv2.erode(inv_mask, np.ones((k, k), np.uint8))
            total_face_area = max(np.sum(inv_mask_erosion), 1)

            if draw_box:
                mb = np.ones((fh, fw, 3), np.float32)
                bt = int(1400 / np.sqrt(total_face_area))
                bt = max(1, min(bt, min(fh, fw) // 20))
                cv2.rectangle(mb, (bt, bt), (fw - bt - 1, fh - bt - 1), (0, 0, 0), -1)
                borders.append(_warp_affine(mb, inv_m, (w_up, h_up)))

            w_edge = int(total_face_area ** 0.5) // 20
            r = max(1, w_edge * 2)
            inv_mask_center = cv2.erode(inv_mask_erosion, np.ones((r, r), np.uint8))
            blur = max(1, w_edge * 2)
            if blur % 2 == 0:
                blur += 1
            inv_soft_mask = cv2.GaussianBlur(inv_mask_center, (blur, blur), 0)[..., None]

            if self.use_parse and self.parser is not None:
                pm = self._parse_soft_mask(face)
                pm = cv2.resize(pm, (fw, fh))
                inv_soft_mask = cv2.warpAffine(pm, inv_m, (w_up, h_up),
                                               flags=cv2.INTER_LINEAR)[..., None]

            upsample_img = inv_soft_mask * inv_restored + \
                (1 - inv_soft_mask) * upsample_img

        out = np.clip(upsample_img, 0, 255).round().astype(np.uint8)
        if draw_box:
            green = np.array([0, 255, 0], out.dtype)
            for b in borders:
                sel = np.any(b > 0.5, axis=2)
                out[sel] = green
        return out


# -----------------------------------------------------------------------------
# Training-time aligner (face_restoration_helper.py:486-611)
# -----------------------------------------------------------------------------

DLIB_TEMPLATE_1024 = np.array([
    [686.77227723, 488.62376238], [586.77227723, 493.59405941],
    [337.91089109, 488.38613861], [437.95049505, 493.51485149],
    [513.58415842, 678.5049505]], dtype=np.float64)
TEMPLATE_3POINTS = np.array([[192, 240], [319, 240], [257, 371]],
                            dtype=np.float64)


class FaceAligner:
    """Training-time pair/single face alignment given precomputed landmarks
    (face_restoration_helper.py:486-611).

    Unlike FaceRestoreHelper it performs no detection: datasets supply the
    5-point (or 3-point) landmarks and this class only solves the LMEDS
    similarity to the FFHQ template and warps. Images are RGB float [0,1];
    the reference round-trips through BGR uint8 before warping, which
    quantizes values — reproduced here for parity.

    Quirk preserved: the reference passes ``img.shape[0:2]`` (h, w) as
    cv2.warpAffine's ``dsize`` (which expects (w, h)); identical for the
    square crops used in KEEP training.
    """

    def __init__(self, upscale_factor, face_size=512, crop_ratio=(1, 1),
                 det_model="retinaface_resnet50", template_3points=False,
                 pad_blur=False):
        self.template_3points = template_3points
        self.upscale_factor = int(upscale_factor)
        self.crop_ratio = crop_ratio
        if crop_ratio[0] < 1 or crop_ratio[1] < 1:
            raise ValueError("crop ratio only supports >=1")
        self.face_size = (int(face_size * crop_ratio[1]),
                          int(face_size * crop_ratio[0]))
        if det_model == "dlib":
            self.face_template = DLIB_TEMPLATE_1024 / (1024 // face_size)
        elif template_3points:
            self.face_template = TEMPLATE_3POINTS.copy()
        else:
            self.face_template = FFHQ_TEMPLATE_512.copy()
        self.face_template = self.face_template * (face_size / 512.0)
        if crop_ratio[0] > 1:
            self.face_template[:, 1] += face_size * (crop_ratio[0] - 1) / 2
        if crop_ratio[1] > 1:
            self.face_template[:, 0] += face_size * (crop_ratio[1] - 1) / 2
        self.pad_blur = pad_blur
        if pad_blur:
            self.template_3points = False

    @staticmethod
    def _border(border_mode):
        return {"constant": cv2.BORDER_CONSTANT,
                "reflect101": cv2.BORDER_REFLECT101,
                "reflect": cv2.BORDER_REFLECT}[border_mode]

    def align_single_face(self, img, landmarks, border_mode="constant"):
        """img: RGB float [0,1] -> aligned RGB float [0,1]."""
        u8 = (img[:, :, ::-1] * 255).round().astype(np.uint8)
        m = estimate_affine(np.asarray(landmarks, np.float64),
                            self.face_template)
        u8 = cv2.warpAffine(u8, m, u8.shape[0:2],
                            borderMode=self._border(border_mode),
                            borderValue=(135, 133, 132))
        return u8[:, :, ::-1] / 255.0

    def align_warp_face(self, img_lq, img_gt, landmarks,
                        border_mode="constant"):
        """BGR uint8 pair -> warped pair. GT landmarks given at GT scale;
        the LQ warp re-solves at landmarks/scale (:585-601)."""
        scale = img_gt.shape[0] / img_lq.shape[0]
        border = self._border(border_mode)
        lm = np.asarray(landmarks, np.float64)
        m_gt = estimate_affine(lm, self.face_template)
        img_gt = cv2.warpAffine(img_gt, m_gt, img_gt.shape[0:2],
                                borderMode=border, borderValue=(135, 133, 132))
        m_lq = estimate_affine(lm / scale, self.face_template / scale)
        img_lq = cv2.warpAffine(img_lq, m_lq, img_lq.shape[0:2],
                                borderMode=border, borderValue=(135, 133, 132))
        return img_lq, img_gt

    def align_pair_face(self, img_lq, img_gt, landmarks):
        """RGB float [0,1] pair -> aligned RGB float [0,1] pair (:549-558)."""
        lq = (img_lq[:, :, ::-1] * 255).round().astype(np.uint8)
        gt = (img_gt[:, :, ::-1] * 255).round().astype(np.uint8)
        lq, gt = self.align_warp_face(lq, gt, landmarks)
        return lq[:, :, ::-1] / 255.0, gt[:, :, ::-1] / 255.0
