"""FID — Fréchet Inception Distance (reference wm_basicsr/metrics/fid.py).

`calculate_fid` computes the Fréchet distance between two Gaussians fitted to
feature activations; `extract_inception_features` runs a provided feature
extractor (the InceptionV3 port in models/inception.py once converted
weights are supplied).
"""
import numpy as np

try:
    from scipy import linalg
    _HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    _HAVE_SCIPY = False

from comfyui_keep_tpu.utils.registry import METRIC_REGISTRY


@METRIC_REGISTRY.register(name="calculate_fid")
def calculate_fid(mu1, sigma1, mu2, sigma2, eps=1e-6):
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu1 - mu2
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def feature_stats(features: np.ndarray):
    """features: (N, D) -> (mu, sigma)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def extract_inception_features(data_iter, feature_fn, len_generator=None):
    """Run feature_fn over batches and concatenate (reference
    fid.py extract_inception_features)."""
    feats = []
    for batch in data_iter:
        feats.append(np.asarray(feature_fn(batch)))
    return np.concatenate(feats, axis=0)
