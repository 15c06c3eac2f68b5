"""Node protocol layer + model zoo tests."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from comfyui_keep_tpu import nodes, api
from comfyui_keep_tpu.utils import zoo

TINY = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=1,
            attn_resolutions=(16,), codebook_size=32, emb_dim=32, dim_embd=32,
            n_head=4, n_layers=1, latent_size=256, cft_list=("32",),
            cfa_list=(), cfa_nhead=2, cfa_dim=8, kalman_attn_head_dim=8,
            num_uncertainty_layers=1, temp_reg_list=())


def test_node_mappings_parity():
    assert set(nodes.NODE_CLASS_MAPPINGS) == {
        "KEEP_ModelLoader", "KEEP_FaceUpscaleImage",
        "KEEP_ProcessImageSequence"}
    assert nodes.NODE_DISPLAY_NAME_MAPPINGS["KEEP_ModelLoader"] == \
        "Load KEEP Models"
    for cls in nodes.NODE_CLASS_MAPPINGS.values():
        schema = cls.INPUT_TYPES()
        assert "required" in schema
        assert hasattr(cls, "RETURN_TYPES") and hasattr(cls, "FUNCTION")
        assert cls.CATEGORY == "ComfyUI-KEEP"  # nodes.py:35,65,109


def test_node_schemas_reference_exact():
    """Widget names / defaults / ranges match the reference nodes.py:19-106
    so saved reference workflows load unchanged."""
    loader = nodes.KEEP_ModelLoaderNode.INPUT_TYPES()
    assert list(loader["required"]) == ["model", "detection_model"]
    assert loader["required"]["model"][0] == ["KEEP", "Asian"]
    assert loader["required"]["detection_model"][0] == [
        "retinaface_resnet50", "retinaface_mobile0.25", "YOLOv5l", "YOLOv5n"]
    assert list(loader["optional"]) == ["bg_upscale_model",
                                        "face_upscale_model"]
    assert nodes.KEEP_ModelLoaderNode.RETURN_NAMES == ("keep_model_pack",)

    single = nodes.KEEP_FaceUpscaleImageNode.INPUT_TYPES()["required"]
    assert list(single) == ["image", "keep_model", "final_upscale_factor",
                            "has_aligned_face", "only_center_face",
                            "draw_bounding_box"]
    f = single["final_upscale_factor"][1]
    assert (f["default"], f["min"], f["max"], f["step"]) == (1.0, 0.5, 4.0, 0.1)
    assert single["only_center_face"][1]["default"] is True

    seq = nodes.KEEP_ProcessImageSequenceNode.INPUT_TYPES()["required"]
    assert list(seq) == ["images", "keep_model", "final_upscale_factor",
                         "has_aligned_frames", "only_center_face",
                         "draw_bounding_box", "max_clip_length"]
    m = seq["max_clip_length"][1]
    assert (m["default"], m["min"], m["max"]) == (20, 1, 100)
    assert nodes.KEEP_ProcessImageSequenceNode.RETURN_NAMES == \
        ("processed_images",)


def test_node_error_trapping(rng):
    """Execution nodes trap errors and return (None,) like the reference
    (nodes.py:84-87, 131-134)."""
    class BrokenPack:
        detection_model = "retinaface_resnet50"

        def load_device(self):
            raise RuntimeError("boom")

        def offload(self):
            self.offloaded = True

    pack = BrokenPack()
    node = nodes.KEEP_FaceUpscaleImageNode()
    img = rng.random((1, 8, 8, 3)).astype(np.float32)
    assert node.upscale_face_image(img, pack, 1.0, False, True, False) == \
        (None,)
    assert pack.offloaded
    # invalid pack (e.g. upstream loader errored -> None): trapped before the
    # try so the finally can't raise (reference nodes.py:66-68)
    assert node.upscale_face_image(img, None, 1.0, False, True, False) == \
        (None,)
    seq = nodes.KEEP_ProcessImageSequenceNode()
    assert seq.process_sequence(img, None, 1.0, False, True, False, 2) == \
        (None,)


def test_single_image_node_roundtrip(rng):
    pack = api.load_models("KEEP", use_cache=False, cfg_overrides=TINY)
    pack.gmflow_params = None
    node = nodes.KEEP_FaceUpscaleImageNode()
    img = rng.random((1, 48, 48, 3)).astype(np.float32)
    (out,) = node.upscale_face_image(img, pack, 1.0, True, True, False)
    assert out.shape == (1, 64, 64, 3)
    assert out.dtype == np.float32 and out.min() >= 0 and out.max() <= 1


def test_sequence_node(rng):
    pack = api.load_models("KEEP", use_cache=False, cfg_overrides=TINY)
    pack.gmflow_params = None
    node = nodes.KEEP_ProcessImageSequenceNode()
    imgs = rng.random((3, 64, 64, 3)).astype(np.float32)
    (out,) = node.process_sequence(imgs, pack, 1.0, True, True, False, 2)
    assert out.shape == (3, 64, 64, 3)


def test_zoo_configs():
    assert set(zoo.KEEP_MODEL_CONFIGS) == {"KEEP", "Asian"}
    cfg = zoo.KEEP_MODEL_CONFIGS["KEEP"]["architecture"]
    assert cfg["cft_list"] == ("16", "32", "64")
    assert zoo.KEEP_MODEL_CONFIGS["Asian"]["architecture"]["cft_list"] == \
        ("32", "64", "128", "256")
    assert len(zoo.FACELIB_MODEL_URLS) == 5


def test_zoo_sha_check(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"hello")
    digest = zoo.sha256_file(str(f))
    assert digest.startswith("2cf24dba")


def test_root_package_entry_exports_nodes():
    """ComfyUI imports the repo root as the custom-node package; the root
    __init__ must export the node mappings (reference __init__.py:16-19)."""
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fake_custom_node_pkg", os.path.join(root, "__init__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.NODE_CLASS_MAPPINGS) == {
        "KEEP_ModelLoader", "KEEP_FaceUpscaleImage",
        "KEEP_ProcessImageSequence"}
    assert mod.NODE_DISPLAY_NAME_MAPPINGS["KEEP_FaceUpscaleImage"] == \
        "KEEP Single Image"
