"""arch_tables must reproduce the reference's hardcoded 512-config tables
(keep_arch.py:940-954) and stay consistent for small configs."""
from comfyui_keep_tpu.models import keep


def test_tables_match_reference_512():
    cfg = keep.KEEP.config("KEEP")
    channels, enc_tap, gen_tap = keep.arch_tables(cfg)
    assert channels == keep.CHANNELS
    assert enc_tap == keep.FUSE_ENCODER_BLOCK
    assert gen_tap == keep.FUSE_GENERATOR_BLOCK


def test_tables_small_config():
    cfg = keep.KEEP.config("KEEP", img_size=64, ch_mult=(1, 2, 2), nf=32,
                           cft_list=("32", "64"), cfa_list=("16",),
                           latent_size=256)
    channels, enc_tap, gen_tap = keep.arch_tables(cfg)
    assert set(channels) == {"64", "32", "16"}
    assert channels["64"] == 32 and channels["16"] == 64
    # plans must be long enough for the taps
    enc_plan, gen_plan = keep.KEEP.make_plans(cfg)
    assert max(enc_tap.values()) < len(enc_plan)
    assert max(gen_tap.values()) < len(gen_plan)
    # tap block must be a ResBlock in both plans
    for f, i in enc_tap.items():
        assert enc_plan[i][0] == "res"
    for f, i in gen_tap.items():
        assert gen_plan[i][0] == "res"


def test_asian_variant_structure():
    """The Asian variant (cft 32..256, no temp_reg — modules/utils.py:58-73)
    builds, its tap tables are tap-valid, and its param count matches the
    reference torch net."""
    import pytest
    from tests import reference_oracle as oracle
    torch = pytest.importorskip("torch")
    if not oracle.reference_available():
        pytest.skip("reference repo not mounted")
    from comfyui_keep_tpu.models.keep import KEEP, convert_checkpoint

    cfg = KEEP.config("Asian")
    assert cfg["cft_list"] == ("32", "64", "128", "256")
    assert cfg["temp_reg_list"] == ()
    _, enc_tap, gen_tap = keep.arch_tables(cfg)
    enc_plan, gen_plan = KEEP.make_plans(cfg)
    for f in cfg["cft_list"]:
        assert enc_plan[enc_tap[f]][0] == "res"
        assert gen_plan[gen_tap[f]][0] == "res"

    ref = oracle.load_ref_keep()
    torch.manual_seed(0)
    net = ref.KEEP(img_size=512, cft_list=['32', '64', '128', '256'],
                   kalman_attn_head_dim=48, num_uncertainty_layers=3,
                   cfa_list=['16', '32'], cfa_nhead=4, cfa_dim=256, cond=1,
                   temp_reg_list=[]).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree, _ = convert_checkpoint(sd)
    assert keep.count_parameters(tree) == \
        sum(p.numel() for p in net.parameters())
