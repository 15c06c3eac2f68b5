"""KEEP: Kalman-inspired feature propagation for video face SR.

TPU-native rebuild of reference keep_arch.py:860-1145. Key structural
differences from the torch original (behavior preserved):

  * The per-frame python loop (keep_arch.py:1062-1127) becomes frame-0
    unrolled + `jax.lax.scan` over frames 1..T-1 — the only true sequential
    dependency is prev_out -> flow_warp -> hq_encoder -> Kalman update.
  * Everything outside the recurrence (LQ encoder, Kalman gain, CFT skip
    taps, optical flow) is batched over (B*T) frames in one XLA program.
  * Feature maps are NHWC; token tensors (B, L, C).
  * enc skips / flows / prev_out are gradient-stopped exactly where the
    reference detaches (keep_arch.py:1026, :1039, :1067, :1091-1096).

Weight layout matches the converted reference checkpoint
(KEEP-b76feb75.pth after utils/checkpoint.py conversion, including the
legacy cross_fuse→cfa / fuse_convs_dict→cft remap).
"""
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (
    conv2d, conv2d_init, group_norm, layer_norm, linear, linear_init,
    resize_bilinear, flow_warp, flow_warp_xy,
)
from comfyui_keep_tpu.models.vqgan import (
    blocks_apply, blocks_init, encoder_plan, generator_plan, res_block,
    vq_init, vq_lookup, _block_init, GN_EPS,
)
from comfyui_keep_tpu.models import layers as L
from comfyui_keep_tpu.ops.norm import layer_norm_init
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

# Per-resolution generator channel table (keep_arch.py:940-947) and flat
# block tap indices (keep_arch.py:950-954) for the canonical 512 config.
# Unlike the reference (which hardcodes them), arch_tables() derives them
# from any config; these constants remain as the parity assertion target.
CHANNELS = {"16": 512, "32": 256, "64": 256, "128": 128, "256": 128, "512": 64}
FUSE_ENCODER_BLOCK = {"512": 2, "256": 5, "128": 8, "64": 11, "32": 14, "16": 18}
FUSE_GENERATOR_BLOCK = {"16": 6, "32": 9, "64": 12, "128": 15, "256": 18, "512": 21}


def arch_tables(cfg):
    """Derive (channels, fuse_encoder_block, fuse_generator_block) tables from
    the VQGAN config by walking the block plans.

    Encoder taps: after the LAST ResBlock of each resolution level
    ("after second residual block for >16, before attn layer for ==16",
    keep_arch.py:949-951). Generator taps: after the FIRST ResBlock of each
    upsampled level, and after the LAST ResBlock of the initial (latent)
    level (keep_arch.py:952-954). Matches the reference tables for the 512
    config (asserted in tests)."""
    nf, ch_mult, nrb = cfg["nf"], cfg["ch_mult"], cfg["res_blocks"]
    img, attn_res = cfg["img_size"], cfg["attn_resolutions"]
    channels, enc_tap, gen_tap = {}, {}, {}

    # encoder walk (mirrors encoder_plan ordering)
    idx = 0  # init conv
    curr = img
    for i in range(len(ch_mult)):
        for b in range(nrb):
            idx += 1
            enc_tap[str(curr)] = idx
            channels[str(curr)] = nf * ch_mult[i]
            if curr in attn_res:
                idx += 1
        if i != len(ch_mult) - 1:
            idx += 1  # down
            curr //= 2

    # generator walk (mirrors generator_plan ordering)
    idx = 3  # init conv, res, attn, res
    curr = img // 2 ** (len(ch_mult) - 1)
    for i in reversed(range(len(ch_mult))):
        first_level = i == len(ch_mult) - 1
        for b in range(nrb):
            idx += 1
            if (first_level and b == nrb - 1) or (not first_level and b == 0):
                gen_tap[str(curr)] = idx
            if curr in attn_res:
                idx += 1
        if i != 0:
            idx += 1  # up
            curr *= 2
    return channels, enc_tap, gen_tap

DEFAULT_CFG = dict(
    img_size=512, nf=64, ch_mult=(1, 2, 2, 4, 4, 8), res_blocks=2,
    attn_resolutions=(16,), codebook_size=1024, emb_dim=256, beta=0.25,
    dim_embd=512, n_head=8, n_layers=9, latent_size=256,
    cft_list=("16", "32", "64"), cfa_list=("16", "32"), cfa_nhead=4,
    cfa_dim=256, kalman_attn_head_dim=48, num_uncertainty_layers=3,
    cond=1, cross_residual=True, temp_reg_list=("32",), mask_ratio=0.0,
)

# Model-zoo variants (reference modules/utils.py:41-90)
VARIANTS = {
    "KEEP": dict(DEFAULT_CFG),
    "Asian": dict(DEFAULT_CFG, cft_list=("32", "64", "128", "256"),
                  temp_reg_list=()),
}


def _plans(cfg):
    enc = encoder_plan(3, cfg["nf"], cfg["emb_dim"], cfg["ch_mult"],
                       cfg["res_blocks"], cfg["img_size"], cfg["attn_resolutions"])
    gen = generator_plan(cfg["nf"], cfg["emb_dim"], cfg["ch_mult"],
                         cfg["res_blocks"], cfg["img_size"], cfg["attn_resolutions"])
    return enc, gen


# ---------------------------------------------------------------------------
# Kalman filter (keep_arch.py:751-821)
# ---------------------------------------------------------------------------

def kalman_filter_init(key, emb_dim: int, n_head: int, head_dim: int, n_layers: int):
    ks = jax.random.split(key, n_layers + 4)
    return {
        "uncertainty_estimator": [
            L.basic_transformer_block_init(ks[i], emb_dim, n_head, head_dim)
            for i in range(n_layers)],
        "kalman_gain_calculator": [
            _block_init(ks[n_layers], ("res", emb_dim, emb_dim)),
            _block_init(ks[n_layers + 1], ("res", emb_dim, emb_dim)),
            _block_init(ks[n_layers + 2], ("res", emb_dim, emb_dim)),
            conv2d_init(ks[n_layers + 3], 1, 1, emb_dim, 1),
        ],
    }


def kalman_calc_gain(p, z_codes, *, n_head: int):
    """z_codes: (B, T, h, w, C) -> gains (B, T, h, w, 1) in [0,1]."""
    b, t, h, w, c = z_codes.shape
    x = z_codes.reshape(b * t, h * w, c)
    for blk in p["uncertainty_estimator"]:
        x = L.basic_transformer_block(blk, x, video_length=t, heads=n_head)
    x = x.reshape(b * t, h, w, c)
    g = p["kalman_gain_calculator"]
    x = res_block(g[0], x)
    x = res_block(g[1], x)
    x = res_block(g[2], x)
    x = conv2d(x, g[3]["w"], g[3]["b"])
    x = jax.nn.sigmoid(x)
    return x.reshape(b, t, h, w, 1)


# ---------------------------------------------------------------------------
# KEEP arch
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register(name="KEEP")
class KEEP:
    make_plans = staticmethod(_plans)

    @staticmethod
    def config(variant: str = "KEEP", **overrides):
        cfg = dict(VARIANTS[variant])
        cfg.update(overrides)
        return cfg

    @staticmethod
    def init(key, **cfg):
        cfg = {**DEFAULT_CFG, **cfg}
        enc_plan, gen_plan = _plans(cfg)
        channels, _, _ = arch_tables(cfg)
        ks = jax.random.split(key, 12)
        params = {
            "encoder": blocks_init(ks[0], enc_plan),
            "hq_encoder": blocks_init(ks[1], enc_plan),
            "generator": blocks_init(ks[2], gen_plan),
            "quantize": vq_init(ks[3], cfg["codebook_size"], cfg["emb_dim"]),
            "kalman_filter": kalman_filter_init(
                ks[4], cfg["emb_dim"], cfg["n_head"], cfg["kalman_attn_head_dim"],
                cfg["num_uncertainty_layers"]),
            "position_emb": jnp.zeros((cfg["latent_size"], cfg["dim_embd"])),
            "feat_emb": linear_init(ks[5], cfg["emb_dim"], cfg["dim_embd"]),
            "ft_layers": [
                L.transformer_sa_layer_init(k, cfg["dim_embd"], cfg["dim_embd"] * 2)
                for k in jax.random.split(ks[6], cfg["n_layers"])],
            "idx_pred_layer": [
                layer_norm_init(cfg["dim_embd"]),
                {"w": jax.random.normal(ks[7], (cfg["dim_embd"], cfg["codebook_size"])) * 0.02},
            ],
            "cfa": {f: L.cfa_init(k, channels[f], cfg["cfa_nhead"], cfg["cfa_dim"])
                    for f, k in zip(cfg["cfa_list"],
                                    jax.random.split(ks[8], max(1, len(cfg["cfa_list"]))))},
            "cft": {f: L.cft_init(k, channels[f], channels[f])
                    for f, k in zip(cfg["cft_list"],
                                    jax.random.split(ks[9], max(1, len(cfg["cft_list"]))))},
        }
        return params

    @staticmethod
    def prepare_phase512(params, **cfg):
        """Serving-time weight prep: pack the 512-level conv stacks of the
        encoders (and the generator tail when no CFT/CFA/temp fusion taps
        land inside it) for phase-packed execution (ops/phase_pack.py).
        apply() auto-detects prepared params. Do NOT train on prepared
        params — gradients must reach the canonical weights."""
        import os
        from comfyui_keep_tpu.models.vqgan import (phase512_prepare,
                                                   phase_encoder_end,
                                                   phase_generator_start)
        cfg = {**DEFAULT_CFG, **cfg}
        if cfg["img_size"] != 512:
            return params
        enc_plan, gen_plan = _plans(cfg)
        _, _, gen_tap = arch_tables(cfg)
        out = dict(params)
        enc_levels = int(os.environ.get("KEEP_TPU_PHASE_ENC_LEVELS", "1"))
        enc_end = phase_encoder_end(enc_plan, max_levels=enc_levels)
        # CFT skip taps inside the packed prefix are depth_to_space'd at tap
        # time (blocks_apply), so no fuse constraint applies to the encoder
        out["encoder"] = phase512_prepare(params["encoder"], enc_plan,
                                          "encoder", enc_end=enc_end)
        out["hq_encoder"] = phase512_prepare(params["hq_encoder"], enc_plan,
                                             "encoder", enc_end=enc_end)
        fuse = {gen_tap[f] for f in (tuple(cfg["cft_list"])
                                     + tuple(cfg["cfa_list"])
                                     + tuple(cfg["temp_reg_list"]))}
        # generator tail packing depth (upsample levels); 1 (the 512 level
        # only) measured best on v5e — packing the 256/128 levels is SLOWER
        # (odd 129/65-cell grids + extra unpack; see docs/ROADMAP.md)
        levels = int(os.environ.get("KEEP_TPU_PHASE_LEVELS", "1"))
        start = phase_generator_start(gen_plan, fuse, max_levels=levels)
        if start is not None:
            out["generator"] = phase512_prepare(params["generator"], gen_plan,
                                                "generator", gen_start=start)
        return out

    # -- forward pieces -----------------------------------------------------

    @staticmethod
    def _tokens_to_code(params, cfg, z_hat, force_idx=None):
        """Latent (B, h, w, C) -> (quant_feat, logits, query_emb tokens).

        force_idx: optional (B, L) int32 codebook indices that replace the
        argmax pick (teacher-forcing). Used by the parity certification to
        separate discrete code-selection agreement from continuous numeric
        fidelity (reference keep_arch.py:1086-1089 picks top-1 per frame)."""
        b, h, w, c = z_hat.shape
        tokens = z_hat.reshape(b, h * w, c)
        q = linear(tokens, params["feat_emb"]["w"], params["feat_emb"]["b"])
        pos = params["position_emb"]
        for lp in params["ft_layers"]:
            q = L.transformer_sa_layer(lp, q, query_pos=pos, num_heads=cfg["n_head"])
        hnorm = layer_norm(q, params["idx_pred_layer"][0])
        logits = hnorm @ params["idx_pred_layer"][1]["w"]  # (B, L, codebook)
        top_idx = jnp.argmax(logits, axis=-1) if force_idx is None else force_idx
        quant = vq_lookup(params["quantize"], top_idx).reshape(b, h, w, -1)
        return quant, logits, q

    @staticmethod
    def _decode_frame(params, cfg, quant_feat, enc_feats_t, prev_cfa_feats,
                      first: bool):
        """Generator pass for one frame with CFT skip fusion and CFA
        cross-frame fusion. prev_cfa_feats: {f_size: (B,s,s,c)}."""
        _, gen_plan = _plans(cfg)
        _, _, gen_tap = arch_tables(cfg)
        cft_idx = {gen_tap[f]: f for f in cfg["cft_list"]}
        cfa_idx = {gen_tap[f]: f for f in cfg["cfa_list"]}
        temp_idx = {gen_tap[f]: f for f in cfg["temp_reg_list"]}
        x = quant_feat
        new_cfa = {}
        gen_feats = {}
        from comfyui_keep_tpu.models.vqgan import (_block_apply,
                                                   packed_generator_tail)
        gen_blocks = params["generator"]["blocks"]
        # first Upsample carrying packed kernels = start of the packed tail
        # (phase512_prepare packs every block from its chosen start onward)
        tail = next((j for j, (s, p) in enumerate(zip(gen_plan, gen_blocks))
                     if s[0] == "up" and isinstance(p, dict) and "p512" in p),
                    None)
        for j, (spec, p) in enumerate(zip(gen_plan, gen_blocks)):
            if j == tail:
                # phase-packed 512-level tail (no fusion taps land here for
                # either model variant; phase512 prep checks this)
                x = packed_generator_tail(params["generator"], gen_plan, x, j)
                break
            x = _block_apply(spec, p, x)
            if j in cft_idx:
                f = cft_idx[j]
                x = L.cft_block(params["cft"][f], enc_feats_t[f], x, cfg["cond"])
            if j in cfa_idx:
                f = cfa_idx[j]
                if first:
                    new_cfa[f] = x
                else:
                    x = L.cfa_layer(params["cfa"][f], x, prev_cfa_feats[f],
                                    heads=cfg["cfa_nhead"],
                                    residual=cfg["cross_residual"])
                    new_cfa[f] = x
            if j in temp_idx:
                gen_feats[temp_idx[j]] = x
        return x, new_cfa, gen_feats

    @staticmethod
    def _make_step(params, cfg, *, detach_16=True, remat=False,
                   profile_mode=None, forced=False, gen_feats0=None):
        """The frames-1..T-1 recurrence body shared by apply() and
        apply_chunks(): carry = (prev_out, prev_cfa), inp = per-frame
        (z_t, gain_t, fx_t, fy_t, enc_t[, forced_idx_t]).

        KEEP_TPU_NO_BARRIERS=1 drops the anti-fusion optimization_barriers
        (a perf knob: they were measured wins on an older XLA whose layout
        assignment misfused across them; re-sweep per XLA upgrade)."""
        import os
        enc_plan, _ = _plans(cfg)
        bar = (jax.lax.optimization_barrier
               if os.environ.get("KEEP_TPU_NO_BARRIERS") != "1"
               else (lambda v: v))

        from comfyui_keep_tpu.ops.norm import batched_scan_guard

        def step(carry, inp):
            with batched_scan_guard():
                return _step_inner(carry, inp)

        def _step_inner(carry, inp):
            prev_out, prev_cfa = carry
            if not forced:
                (z_t, gain_t, fx_t, fy_t, enc_t), fi_t = inp, None
            else:
                z_t, gain_t, fx_t, fy_t, enc_t, fi_t = inp
            # profile_mode isolates scan-step components for perf triage
            if profile_mode == "no_hq":
                z_hat = z_t
            else:
                # optimization_barrier: without it XLA fuses the warp's
                # gathers into the encoder's first packed conv with a
                # pathological layout (+2 ms/step on v5e, docs/ROADMAP.md)
                warped = bar(
                    flow_warp_xy(jax.lax.stop_gradient(prev_out), fx_t, fy_t))
                z_prime = blocks_apply(params["hq_encoder"], enc_plan, warped,
                                       remat=remat)
                z_hat = (1.0 - gain_t) * z_t + gain_t * z_prime
            if profile_mode == "no_transformer":
                quant, logits_t = z_hat, jnp.zeros(
                    (z_hat.shape[0], cfg["latent_size"], cfg["codebook_size"]),
                    z_hat.dtype)
            else:
                quant, logits_t, _ = KEEP._tokens_to_code(params, cfg, z_hat,
                                                          force_idx=fi_t)
            if detach_16:
                quant = jax.lax.stop_gradient(quant)
            if profile_mode == "no_generator":
                out = jnp.zeros_like(prev_out) + quant.mean()
                new_cfa = prev_cfa
                gen_feats = {f: jnp.zeros_like(v) for f, v in gen_feats0.items()}
            else:
                # barriers on the 16x16 quant entering the generator and the
                # 512x512 frame leaving it: same fusion-pathology class as
                # the warp barrier above (-8 ms/clip on v5e)
                out, new_cfa, gen_feats = KEEP._decode_frame(
                    params, cfg, bar(quant), enc_t,
                    prev_cfa, first=False)
                out = bar(out)
            return (out, new_cfa), (out, logits_t, gen_feats)

        return jax.checkpoint(step) if remat else step

    @staticmethod
    def apply_chunks(params, x, flows=None, *, scan_unroll: int = 1, **cfg):
        """Serving-only multi-chunk forward: x (G, T, H, W, 3) in [-1, 1]
        -> (G, T, H, W, 3), each chunk restored independently (the
        reference's per-chunk state reset, keep_processor.py:263-270).

        Equivalent to G independent KEEP.apply(x[i:i+1]) calls, but every
        NON-recurrent stage — LQ encoder + CFT taps, Kalman gain, frame-0
        token pick + decode — runs batched over all G chunks (G*T frames)
        in one pass, where the convs reach measurably better MXU
        utilization than per-chunk (round-4 ledger: 2.59 -> 2.01 ms/frame
        at 40 frames). Only the true recurrence (frames 1..T-1) runs as
        lax.map of B=1 scan bodies: batching the scan body itself is the
        XLA packed-conv layout pathology (B=2 scan 2x worse than linear,
        round-4 bisection).

        flows: (fx, fy) planes each (G, T-1, H, W) (flow_from_clip
        planes=True on the (G, T) clip stack), a dense (G, T-1, H, W, 2)
        tensor, or None for zeros."""
        cfg = {**DEFAULT_CFG, **cfg}
        g, t = x.shape[:2]
        h, w = x.shape[2], x.shape[3]
        if flows is None:
            fxs = fys = jnp.zeros((g, t - 1, h, w), x.dtype)
        elif isinstance(flows, (tuple, list)):
            fxs, fys = flows
        else:
            fxs, fys = flows[..., 0], flows[..., 1]
        fxs = jax.lax.stop_gradient(fxs)
        fys = jax.lax.stop_gradient(fys)

        enc_plan, _ = _plans(cfg)
        _, enc_tap, _ = arch_tables(cfg)
        tap = {enc_tap[f]: f for f in cfg["cft_list"]}
        xf = x.reshape(g * t, h, w, 3)
        z, taps = blocks_apply(params["encoder"], enc_plan, xf,
                               tap_indices=list(tap), remat=False)
        enc_feats = {tap[i]: jax.lax.stop_gradient(v).reshape(
            (g, t) + v.shape[1:]) for i, v in taps.items()}
        hl = z.shape[1]
        z_codes = z.reshape(g, t, hl, hl, -1)
        gains = kalman_calc_gain(params["kalman_filter"], z_codes,
                                 n_head=cfg["n_head"])

        # frame 0 of every chunk, batched (straight-line convs batch fine)
        quant0, _, _ = KEEP._tokens_to_code(params, cfg, z_codes[:, 0])
        quant0 = jax.lax.stop_gradient(quant0)
        out0, cfa_feats0, _ = KEEP._decode_frame(
            params, cfg, quant0,
            {f: enc_feats[f][:, 0] for f in cfg["cft_list"]}, {}, first=True)

        if t == 1:
            return out0[:, None]

        step_fn = KEEP._make_step(params, cfg, remat=False)

        def one(args):
            zc, gn, fx, fy, enc, o0, cfa0 = args
            init = (o0[None], {k: v[None] for k, v in cfa0.items()})
            xs = (
                zc[1:, None],                         # (t-1, 1, hl, hl, C)
                gn[1:, None],
                fx[:, None],
                fy[:, None],
                {f: enc[f][1:, None] for f in cfg["cft_list"]},
            )
            _, (outs_rest, _, _) = jax.lax.scan(step_fn, init, xs,
                                                unroll=scan_unroll)
            return jnp.concatenate([o0[None], outs_rest[:, 0]], axis=0)

        enc_stack = {f: enc_feats[f] for f in cfg["cft_list"]}
        return jax.lax.map(
            one, (z_codes, gains, fxs, fys, enc_stack, out0, cfa_feats0))

    @staticmethod
    def apply(params, x, flows=None, *, detach_16=True, need_upscale=False,
              return_aux=False, remat=True, profile_mode=None, carry=None,
              return_carry=False, scan_unroll: int = 1, force_indices=None,
              **cfg):
        """x: (B, T, H, W, 3) in [-1, 1] -> (B, T, 512, 512, 3).

        flows: (B, T-1, H, W, 2) forward flows (frame i -> i-1 displacement
        as produced by GMFlow(x_{i}, x_{i-1}), reference keep_arch.py:976-986),
        or a (fx, fy) tuple of (B, T-1, H, W) planes (flow_from_clip
        planes=True) — the scan consumes planes, so the tuple form skips the
        interleave/de-interleave round trip at full resolution.
        Zeros if None (static-face approximation / single image path).

        carry / return_carry (TPU-native extension, not in the reference —
        keep_processor.py:263-270 resets state every max_clip_length chunk):
        carry = (prev_out (B,H,W,3), prev_cfa {res: (B,s,s,c)}) from a prior
        chunk's return_carry=True call. With carry, ALL T frames run through
        the recurrence (flows must then be (B, T, H, W, 2), flow[:, 0] mapping
        frame 0 back to the carried frame) — streaming restoration of clips
        longer than one compiled program.
        """
        cfg = {**DEFAULT_CFG, **cfg}
        b, t = x.shape[:2]
        if need_upscale:
            hw = (x.shape[2] * 4, x.shape[3] * 4)
            x = resize_bilinear(x, hw)
        h, w = x.shape[2], x.shape[3]
        if flows is None:
            n_flows = t if carry is not None else t - 1
            fxs = fys = jax.lax.stop_gradient(
                jnp.zeros((b, n_flows, h, w), x.dtype))
        elif isinstance(flows, (tuple, list)):
            fxs, fys = (jax.lax.stop_gradient(f) for f in flows)
        else:
            flows = jax.lax.stop_gradient(flows)
            fxs, fys = flows[..., 0], flows[..., 1]

        enc_plan, _ = _plans(cfg)

        # --- batched LQ encoder over all frames, tapping CFT skips ---------
        _, enc_tap, _ = arch_tables(cfg)
        tap = {enc_tap[f]: f for f in cfg["cft_list"]}
        xf = x.reshape(b * t, h, w, 3)
        z, taps = blocks_apply(params["encoder"], enc_plan, xf,
                               tap_indices=list(tap), remat=remat)
        lq_feat = z  # (B*T, 16, 16, emb)
        enc_feats = {tap[i]: jax.lax.stop_gradient(v).reshape(
            (b, t) + v.shape[1:]) for i, v in taps.items()}

        hl = z.shape[1]
        z_codes = z.reshape(b, t, hl, hl, -1)

        # --- Kalman gain over the whole clip --------------------------------
        gains = kalman_calc_gain(params["kalman_filter"], z_codes,
                                 n_head=cfg["n_head"])

        if carry is not None:
            # streaming mode: every frame propagates from the carried state
            if profile_mode is not None:
                raise ValueError("profile_mode is incompatible with carry")
            init, start, gen_feats0 = carry, 0, None
        else:
            # --- frame 0 (no propagation) -----------------------------------
            quant0, logits0, _ = KEEP._tokens_to_code(
                params, cfg, z_codes[:, 0],
                force_idx=None if force_indices is None else force_indices[:, 0])
            if detach_16:
                quant0 = jax.lax.stop_gradient(quant0)
            out0, cfa_feats0, gen_feats0 = KEEP._decode_frame(
                params, cfg, quant0,
                {f: enc_feats[f][:, 0] for f in cfg["cft_list"]}, {}, first=True)

            if profile_mode == "no_scan":
                # pre/post attribution: everything except the scan (batched
                # encoder + gain + frame-0 + output marshalling)
                outs = jnp.broadcast_to(out0[:, None], (b, t) + out0.shape[1:])
                outs = outs + 0 * gains.sum()  # keep the gain calc live
                return KEEP._pack(outs, jnp.broadcast_to(
                    logits0[:, None], (b, t) + logits0.shape[1:]),
                    lq_feat, {f: jnp.broadcast_to(
                        v[:, None], (b, t) + v.shape[1:])
                        for f, v in gen_feats0.items()}, return_aux)

            if t == 1:
                outs = out0[:, None]
                logits = logits0[:, None]
                gen_feat_dict = {f: v[:, None] for f, v in gen_feats0.items()}
                res = KEEP._pack(outs, logits, lq_feat, gen_feat_dict,
                                 return_aux)
                return (res, (out0, cfa_feats0)) if return_carry else res
            init, start = (out0, cfa_feats0), 1

        # --- frames 1..T-1 as lax.scan --------------------------------------
        step_fn = KEEP._make_step(params, cfg, detach_16=detach_16,
                                  remat=remat, profile_mode=profile_mode,
                                  forced=force_indices is not None,
                                  gen_feats0=gen_feats0)

        xs = (
            jnp.moveaxis(z_codes[:, start:], 1, 0),
            jnp.moveaxis(gains[:, start:], 1, 0),
            # flow as dense x/y planes: the (..., 2) interleaved layout makes
            # the per-step xs slice + de-interleave cost ~1.2 ms at 512x512
            jnp.moveaxis(fxs, 1, 0),
            jnp.moveaxis(fys, 1, 0),
            {f: jnp.moveaxis(enc_feats[f][:, start:], 1, 0)
             for f in cfg["cft_list"]},
        )
        if force_indices is not None:
            xs = xs + (jnp.moveaxis(force_indices[:, start:], 1, 0),)
        (fin_out, fin_cfa), (outs_rest, logits_rest, gen_feats_rest) = \
            jax.lax.scan(step_fn, init, xs, unroll=scan_unroll)

        if carry is not None:
            outs = jnp.moveaxis(outs_rest, 0, 1)
            logits = jnp.moveaxis(logits_rest, 0, 1)
            gen_feat_dict = {f: jnp.moveaxis(v, 0, 1)
                             for f, v in gen_feats_rest.items()}
        else:
            outs = jnp.concatenate(
                [out0[:, None], jnp.moveaxis(outs_rest, 0, 1)], axis=1)
            logits = jnp.concatenate(
                [logits0[:, None], jnp.moveaxis(logits_rest, 0, 1)], axis=1)
            gen_feat_dict = {
                f: jnp.concatenate([gen_feats0[f][:, None],
                                    jnp.moveaxis(gen_feats_rest[f], 0, 1)],
                                   axis=1)
                for f in gen_feats0}
        res = KEEP._pack(outs, logits, lq_feat, gen_feat_dict, return_aux)
        return (res, (fin_out, fin_cfa)) if return_carry else res

    @staticmethod
    def _pack(outs, logits, lq_feat, gen_feat_dict, return_aux):
        if not return_aux:
            return outs
        b, t = logits.shape[:2]
        logits = logits.reshape((b * t,) + logits.shape[2:])
        return outs, {"logits": logits, "lq_feat": lq_feat,
                      "gen_feat_dict": gen_feat_dict}


def convert_checkpoint(sd):
    """Reference KEEP .pth state dict (numpy) -> (param tree, flownet sd).

    Reproduces keep_model_loader.py:105-120 semantics: legacy key remap
    cross_fuse→cfa / fuse_convs_dict→cft; the GMFlow subtree is returned
    separately (converted by models/gmflow.py).
    """
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict, embedding_rule
    # flownet is FlowGenerator wrapping GMFlow as `.model` (gmflow_arch.py:10-38)
    flownet_sd = {k[len("flownet.model."):]: v for k, v in sd.items()
                  if k.startswith("flownet.model.")}
    rest = {k: v for k, v in sd.items() if not k.startswith("flownet.")}
    tree = convert_state_dict(
        rest,
        rules=[embedding_rule("quantize.embedding", ("quantize", "embedding"))],
        key_remap=[("cross_fuse", "cfa"), ("fuse_convs_dict", "cft")])
    # torch nn.MultiheadAttention packs q/k/v: split into our layout
    for layer in tree["ft_layers"]:
        sa = layer["self_attn"]
        ipw = sa.pop("in_proj_weight")
        ipb = sa.pop("in_proj_bias")
        e = ipw.shape[1]
        sa["q_w"], sa["k_w"], sa["v_w"] = ipw[:e].T, ipw[e:2 * e].T, ipw[2 * e:].T
        sa["q_b"], sa["k_b"], sa["v_b"] = ipb[:e], ipb[e:2 * e], ipb[2 * e:]
        op = sa.pop("out_proj")
        sa["out_w"], sa["out_b"] = op["w"], op["b"]
    return tree, flownet_sd


def mask_by_ratio(key, z_codes, mask_ratio: float = 0.0):
    """Training-time random token masking (keep_arch.py:988-1006).
    z_codes: (B, T, h, w, C)."""
    if mask_ratio == 0:
        return z_codes
    b, t, h, w, c = z_codes.shape
    d = h * w
    keep = int(d * (1 - mask_ratio))
    scores = jax.random.uniform(key, (b, t, d))
    thresh = -jnp.sort(-scores, axis=-1)[..., keep - 1:keep]
    mask = (scores >= thresh).astype(z_codes.dtype).reshape(b, t, h, w, 1)
    return z_codes * mask


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
