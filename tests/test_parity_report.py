"""End-to-end test of tools/parity_report.py: random-weight checkpoints
written in BOTH torch .pth serialization formats (zip and legacy), one
command producing the per-config PSNR/SSIM report vs the >=40 dB bar.

The tool runs in a subprocess (fresh module space: the reference keep_arch /
gmflow module aliases are process-global) on the CPU backend, mirroring how
a user certifies real checkpoints (KEEP-b76feb75.pth etc.).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "parity_report.py")

# full-size 512 spatial path (the reference pipeline hardcodes 512 crops,
# keep_processor.py:245,266) with tiny channel counts; empty cft/cfa lists
# because the reference's channel table is hardcoded for the real 512 net
# emb_dim must stay 256: the reference hardcodes it in the codebook decode
# (keep_arch.py:1089 `shape=[b, code_h, code_h, 256]`)
SMALL512 = dict(img_size=512, nf=32, ch_mult=[1, 1, 1, 1, 1, 2], res_blocks=1,
                attn_resolutions=[16], codebook_size=64, emb_dim=256,
                dim_embd=64, n_head=4, n_layers=2, latent_size=256,
                cft_list=[], cfa_list=[], kalman_attn_head_dim=8,
                num_uncertainty_layers=1, temp_reg_list=[])

# 64-px config for the unaligned paths (no 512 hardcodes on those)
TINY64 = dict(SMALL512, img_size=64, ch_mult=[1, 1, 2], latent_size=256)


def _ref_kwargs(cfg):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_report
    return parity_report.ReferenceSide._ref_kwargs(
        {**_full_cfg(), **cfg})


def _full_cfg():
    from comfyui_keep_tpu.models.keep import DEFAULT_CFG
    return dict(DEFAULT_CFG)


def _write_ckpt(path, cfg, with_flownet, legacy, key="params_ema"):
    """Random-weight composite checkpoint in the reference's on-disk layout
    (keep_model_loader.py:105-120: dict keyed params_ema/params; flownet
    embedded as flownet.model.*)."""
    ref = oracle.load_ref_keep()  # zero-flow stub: no flownet params
    torch.manual_seed(0)
    net = ref.KEEP(**_ref_kwargs(cfg)).eval()
    sd = dict(net.state_dict())
    if with_flownet:
        gm_mod = oracle.install_real_gmflow()
        torch.manual_seed(1)
        gm = gm_mod.GMFlow().eval()
        for k, v in gm.state_dict().items():
            sd[f"flownet.model.{k}"] = v
    torch.save({key: sd}, path,
               _use_new_zipfile_serialization=not legacy)
    return path


def _run_tool(ckpt, out, configs, cfg, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["KEEP_TPU_NO_PHASE512"] = env.get("KEEP_TPU_NO_PHASE512", "0")
    # NB: the tool forces the CPU backend itself (jax.config, not env — the
    # image's sitecustomize initializes the axon/TPU platform at interpreter
    # startup and TPU matmuls are bf16-ish, a deterministic ~1e-2 deviation
    # that caps PSNR at ~16 dB no matter the declared dtype)
    proc = subprocess.run(
        [sys.executable, TOOL, "--keep-ckpt", ckpt, "--out", out,
         "--configs", configs, "--cfg-json", json.dumps(cfg), *extra],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    with open(out) as f:
        return json.load(f)


def test_zip_ckpt_configs_1_3(tmp_path):
    """zip-format .pth with embedded flownet -> aligned single-image and
    Kalman-sequence configs, both frameworks, >=40 dB."""
    ckpt = _write_ckpt(str(tmp_path / "keep_zip.pth"), SMALL512,
                       with_flownet=True, legacy=False)
    report = _run_tool(ckpt, str(tmp_path / "report.json"), "1,3", SMALL512,
                       extra=["--frames", "3", "--clip", "2"])
    assert report["reference_run"] is True
    for c in ("1", "3"):
        r = report["configs"][c]
        assert r.get("error") is None, r
        assert r["psnr_db"] >= 40.0, r
        assert r["pass"] is True, r
    assert report["all_pass"] is True


@pytest.mark.slow
def test_full_zoo_drill(tmp_path):
    """The real-weights readiness drill: synthesize ALL FIVE zoo files in
    exact reference serialization (tools/synth_zoo.py), then certify with
    one command (--zoo-dir) — REAL RetinaFace + ParseNet + RRDBNet forwards
    on BOTH sides (no stubs). The day real checkpoints are reachable this
    exact invocation certifies them with zero code changes."""
    zoo = str(tmp_path / "zoo")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "synth_zoo.py"),
         "--out-dir", zoo, "--cfg-json", json.dumps(TINY64),
         "--rrdb-blocks", "1"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500)
    assert proc.returncode == 0, f"synth_zoo failed:\n{proc.stdout}\n{proc.stderr}"
    for sub, fname in (("keep_models/KEEP", "KEEP-b76feb75.pth"),
                       ("facedetection", "detection_Resnet50_Final.pth"),
                       ("facedetection", "parsing_parsenet.pth"),
                       ("upscale_models", "RealESRGAN_x2_bg.pth"),
                       ("upscale_models", "RealESRGAN_x2_face.pth")):
        assert os.path.exists(os.path.join(zoo, sub, fname)), fname

    out = str(tmp_path / "report.json")
    proc = subprocess.run(
        [sys.executable, TOOL, "--zoo-dir", zoo, "--out", out,
         "--configs", "2,4,5", "--cfg-json", json.dumps(TINY64),
         "--frames", "2", "--clip", "4", "--input-size", "512"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    with open(out) as f:
        report = json.load(f)
    assert report["detector"].startswith("RetinaFace-ResNet50"), report["detector"]
    assert report["parser"].startswith("ParseNet"), report["parser"]
    assert report["upscalers"].startswith("RRDBNet"), report["upscalers"]
    for c in ("2", "4", "5"):
        r = report["configs"][c]
        assert r.get("error") is None, r
        # raw psnr is informational (argmax chaos floor on real crops);
        # the certifying legs are detection parity + the forced net pass
        assert r["psnr_db"] is not None, r
        assert r["psnr_db_forced"] >= 40.0, r
        assert r["index_agreement"] >= 0.95, r
        assert r["pass"] is True, r
        det = r["det"]
        assert det["counts_agree"] is True, det
        assert sum(det["detections_per_frame"]) > 0, det
        assert det["landmarks_agree"] is True, det
        assert det["agree"] is True, det
    assert report["all_pass"] is True


def test_legacy_ckpt_configs_2_4_5(tmp_path):
    """legacy-format .pth under the 'params' key (no EMA, no flownet) ->
    unaligned detect/track/paste + upscaler-compositing configs."""
    ckpt = _write_ckpt(str(tmp_path / "keep_legacy.pth"), TINY64,
                       with_flownet=False, legacy=True, key="params")
    report = _run_tool(ckpt, str(tmp_path / "report.json"), "2,4,5", TINY64,
                       extra=["--frames", "2", "--clip", "4"])
    assert report["reference_run"] is True
    for c in ("2", "4", "5"):
        r = report["configs"][c]
        assert r.get("error") is None, r
        assert r["psnr_db"] >= 40.0, r
        assert r["pass"] is True, r
    assert report["all_pass"] is True


def test_cert_provenance_fields(tmp_path):
    """cert_provenance() binds artifacts to code state: stable for an
    unchanged tree, sensitive to any cert-relevant source edit."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_report
    prov = parity_report.cert_provenance()
    assert prov["cert_sources"], "no cert sources hashed"
    assert "tools/parity_report.py" in prov["cert_sources"]
    assert any(k.startswith("comfyui_keep_tpu/models/")
               for k in prov["cert_sources"])
    assert prov == parity_report.cert_provenance()  # deterministic


def test_cert_artifact_not_stale():
    """The committed parity_tpu.json must have been captured at the
    current content of every cert-relevant source. A mismatch means the
    certification predates a code change: re-run
    `python tools/parity_report.py --zoo-dir ... --backend tpu
    --matmul-precision highest --out parity_tpu.json` and commit the
    artifact (VERDICT r4 item 5)."""
    art = os.path.join(REPO, "parity_tpu.json")
    if not os.path.exists(art):
        pytest.skip("no committed parity_tpu.json")
    with open(art) as f:
        report = json.load(f)
    if "cert_sources" not in report:
        pytest.skip("parity_tpu.json predates provenance binding — "
                    "re-certify to stamp git_rev + source hashes "
                    "(staleness enforcement starts with the next capture)")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_report
    now = parity_report.cert_provenance()["cert_sources"]
    stale = sorted(k for k in set(report["cert_sources"]) | set(now)
                   if report["cert_sources"].get(k) != now.get(k))
    assert not stale, (
        f"certification artifact is STALE — these cert-relevant sources "
        f"changed since capture (re-certify): {stale}")
    assert report.get("all_pass") is True, (
        "committed parity_tpu.json is not all_pass — re-certify")
