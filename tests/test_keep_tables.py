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
