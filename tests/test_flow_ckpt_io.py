"""Flow file IO + checkpoint round-trips (npz + orbax)."""
import numpy as np
import pytest


def test_flo_roundtrip(tmp_path, rng):
    from comfyui_keep_tpu.utils.flow import flowread, flowwrite
    flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flowwrite(flow, p)
    back = flowread(p)
    np.testing.assert_allclose(back, flow, atol=1e-7)


def test_quantize_roundtrip(rng):
    from comfyui_keep_tpu.utils.flow import quantize_flow, dequantize_flow
    flow = (rng.standard_normal((6, 6, 2)) * 0.005).astype(np.float32)
    dx, dy = quantize_flow(flow)
    back = dequantize_flow(dx, dy)
    # quantization error bounded by 1 step over [−0.02, 0.02] * dims
    assert np.abs(back / np.array([6, 6]) - flow / np.array([6, 6])).max() < 2e-3


def test_npz_checkpoint_roundtrip(tmp_path, rng):
    from comfyui_keep_tpu.utils.checkpoint import save_npz, load_npz
    tree = {"a": {"w": rng.standard_normal((3, 4)).astype(np.float32)},
            "blocks": [{"b": np.ones(2, np.float32)}, None,
                       {"b": np.zeros(2, np.float32)}]}
    p = str(tmp_path / "ck.npz")
    save_npz(p, tree)
    back = load_npz(p)
    np.testing.assert_allclose(back["a"]["w"], tree["a"]["w"])
    np.testing.assert_allclose(back["blocks"][0]["b"], 1.0)
    assert back["blocks"][1] is None


def test_orbax_roundtrip(tmp_path, rng):
    pytest.importorskip("orbax.checkpoint")
    import jax.numpy as jnp
    from comfyui_keep_tpu.training.state import save_orbax, load_orbax
    tree = {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32),
            "nested": {"b": jnp.zeros((2,))}}
    p = str(tmp_path / "orbax_ck")
    save_orbax(p, tree)
    back = load_orbax(p, like=tree)
    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(tree["w"]))


def test_train_state_save_resume(tmp_path, rng):
    import jax.numpy as jnp
    from comfyui_keep_tpu.training.state import TrainState
    state = TrainState(params={"w": jnp.ones((2,))},
                       opt_state={"m": jnp.zeros((2,))}, epoch=1)
    net_p, state_p = state.save(str(tmp_path / "models"),
                                str(tmp_path / "states"), 42)
    latest = TrainState.latest_state(str(tmp_path / "states"))
    assert latest == state_p
    s2 = TrainState(params=None, opt_state=None)
    s2.resume(latest)
    assert s2.iter == 42 and s2.epoch == 1


class TestTorchFreeReader:
    def test_matches_torch_load(self, tmp_path, rng):
        import torch
        from comfyui_keep_tpu.utils.checkpoint import (read_pth,
                                                       read_pth_torchfree)
        net = torch.nn.Sequential(
            torch.nn.Conv2d(3, 4, 3), torch.nn.BatchNorm2d(4),
            torch.nn.Linear(4, 2))
        p = str(tmp_path / "net.pth")
        torch.save({"params_ema": net.state_dict()}, p)
        tf = read_pth_torchfree(p)["params_ema"]
        ref = {k: v.numpy() for k, v in net.state_dict().items()}
        assert set(tf) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(tf[k]), ref[k])

    def test_read_pth_env_override(self, tmp_path, monkeypatch):
        import torch
        from comfyui_keep_tpu.utils.checkpoint import read_pth
        t = torch.nn.Linear(2, 3)
        p = str(tmp_path / "lin.pth")
        torch.save(t.state_dict(), p)
        monkeypatch.setenv("KEEP_TPU_NO_TORCH", "1")
        out = read_pth(p)
        np.testing.assert_allclose(out["weight"],
                                   t.weight.detach().numpy(), atol=0)

    def test_noncontiguous_and_scalar(self, tmp_path):
        import torch
        from comfyui_keep_tpu.utils.checkpoint import read_pth_torchfree
        big = torch.arange(24, dtype=torch.float32).reshape(4, 6)
        obj = {"t": big.t(),            # transposed (non-trivial strides)
               "s": torch.tensor(7.5)}  # 0-dim
        p = str(tmp_path / "odd.pth")
        torch.save(obj, p)
        out = read_pth_torchfree(p)
        np.testing.assert_array_equal(np.asarray(out["t"]), big.t().numpy())
        assert float(out["s"]) == 7.5


def test_merge_network_params_nonstrict():
    import jax.numpy as jnp
    from comfyui_keep_tpu.training.state import merge_network_params
    params = {"a": {"w": jnp.zeros((2, 2)), "b": jnp.zeros(2)},
              "c": jnp.ones(3)}
    loaded = {"a": {"w": np.full((2, 2), 5.0), "b": np.zeros(4)}}
    out = merge_network_params(params, loaded, strict=False)
    assert float(out["a"]["w"][0, 0]) == 5.0     # loaded
    assert out["a"]["b"].shape == (2,)            # mismatch -> init kept
    assert float(out["c"][0]) == 1.0              # missing -> init kept
    with pytest.raises((KeyError, ValueError)):
        merge_network_params(params, loaded, strict=True)
