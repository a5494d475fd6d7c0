import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.vae import (
    SD_VAE,
    VAEConfig,
    gaussian_kl,
    gaussian_sample,
    init_vae_params,
    vae_decode,
    vae_encode,
    vae_encode_moments,
)

TINY = VAEConfig(base_ch=16, ch_mult=(1, 2, 2), num_res_blocks=1, norm_groups=8)


def test_vae_roundtrip_shapes():
    params = init_vae_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    z = vae_encode(params, x, TINY)
    assert z.shape == (2, 4, 8, 8)  # 2 downsamples in TINY
    rec = vae_decode(params, z, TINY)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()


def test_gaussian_distribution():
    moments = jnp.concatenate(
        [jnp.full((1, 4, 2, 2), 1.5), jnp.full((1, 4, 2, 2), -40.0)], axis=1
    )
    mode = gaussian_sample(moments)
    np.testing.assert_allclose(np.asarray(mode), 1.5)
    # logvar clamped to -30 → tiny std, sample ≈ mean
    s = gaussian_sample(moments, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s), 1.5, atol=1e-3)
    kl = gaussian_kl(jnp.zeros((1, 8, 2, 2)))
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_masked_encode_blocks_fg_bg_attention():
    """fg latents must not change when bg pixels are scrambled *through the
    attention path*. Convs still mix locally, so compare against the
    unmasked encoder: masking must strictly reduce bg→fg leakage."""
    params = init_vae_params(jax.random.PRNGKey(0), TINY)
    rs = np.random.RandomState(0)
    x1 = rs.randn(1, 3, 32, 32).astype(np.float32)
    x2 = x1.copy()
    x2[:, :, :, 20:] = rs.randn(1, 3, 32, 12)  # scramble right side (bg)
    fg = np.ones((1, 1, 32, 32), np.float32)
    fg[:, :, :, 16:] = 0.0
    mask = {"fg_mask": jnp.asarray(fg), "aug_mask": None}

    def fg_latent_diff(masked):
        m = mask if masked else None
        z1 = vae_encode_moments(params, jnp.asarray(x1), TINY, mask=m)
        z2 = vae_encode_moments(params, jnp.asarray(x2), TINY, mask=m)
        # latent fg region (left half minus border effects)
        return float(jnp.abs(z1[..., :2] - z2[..., :2]).mean())

    assert fg_latent_diff(masked=True) < fg_latent_diff(masked=False)


def test_sd_vae_param_count():
    params = init_vae_params(jax.random.PRNGKey(0), SD_VAE)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # diffusers SD VAE: 83,653,863 params
    assert abs(n - 83_653_863) < 1e5, n


def test_vae_converter_roundtrip():
    """params → LDM-style names → params must be exact."""
    from adaface_tpu.tools.convert_sd import convert_vae_ldm

    params = init_vae_params(jax.random.PRNGKey(0), TINY)

    # export to LDM naming by hand (tests the mapping conventions)
    sd = {}

    def put_conv(p, d):
        sd[f"{p}.weight"] = np.asarray(d["w"]).transpose(3, 2, 0, 1)
        sd[f"{p}.bias"] = np.asarray(d["b"])

    def put_norm(p, d):
        sd[f"{p}.weight"] = np.asarray(d["scale"])
        sd[f"{p}.bias"] = np.asarray(d["bias"])

    def put_res(p, d):
        put_norm(f"{p}.norm1", d["norm1"]); put_conv(f"{p}.conv1", d["conv1"])
        put_norm(f"{p}.norm2", d["norm2"]); put_conv(f"{p}.conv2", d["conv2"])
        if "nin_shortcut" in d:
            put_conv(f"{p}.nin_shortcut", d["nin_shortcut"])

    def put_attn(p, d):
        put_norm(f"{p}.norm", d["norm"])
        for k in ("q", "k", "v", "proj_out"):
            put_conv(f"{p}.{k}", d[k])

    enc = params["encoder"]
    put_conv("encoder.conv_in", enc["conv_in"])
    for i, level in enumerate(enc["down"]):
        for j, blk in enumerate(level["blocks"]):
            put_res(f"encoder.down.{i}.block.{j}", blk)
        if "downsample" in level:
            put_conv(f"encoder.down.{i}.downsample.conv", level["downsample"])
    put_res("encoder.mid.block_1", enc["mid"]["block_1"])
    put_attn("encoder.mid.attn_1", enc["mid"]["attn_1"])
    put_res("encoder.mid.block_2", enc["mid"]["block_2"])
    put_norm("encoder.norm_out", enc["norm_out"])
    put_conv("encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    put_conv("decoder.conv_in", dec["conv_in"])
    put_res("decoder.mid.block_1", dec["mid"]["block_1"])
    put_attn("decoder.mid.attn_1", dec["mid"]["attn_1"])
    put_res("decoder.mid.block_2", dec["mid"]["block_2"])
    n_levels = len(TINY.ch_mult)
    for store_idx, level in enumerate(dec["up"]):
        ldm_idx = n_levels - 1 - store_idx  # CompVis reversed indexing
        for j, blk in enumerate(level["blocks"]):
            put_res(f"decoder.up.{ldm_idx}.block.{j}", blk)
        if "upsample" in level:
            put_conv(f"decoder.up.{ldm_idx}.upsample.conv", level["upsample"])
    put_norm("decoder.norm_out", dec["norm_out"])
    put_conv("decoder.conv_out", dec["conv_out"])
    put_conv("quant_conv", params["quant_conv"])
    put_conv("post_quant_conv", params["post_quant_conv"])

    rec = convert_vae_ldm(sd, TINY)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 32, 32))
    z1 = vae_encode(params, x, TINY)
    z2 = vae_encode(rec, x, TINY)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
    r1 = vae_decode(params, z1, TINY)
    r2 = vae_decode(rec, z1, TINY)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_unet_converter_roundtrip():
    from adaface_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
    from adaface_tpu.tools.convert_sd import convert_unet, export_unet_to_diffusers

    cfg = UNetConfig(
        block_channels=(32, 64, 64, 64), cross_attn_dim=48, num_heads=4,
        norm_groups=8,
    )
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    sd = export_unet_to_diffusers(params, cfg)
    rec = convert_unet(sd, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 48))
    e1, _ = unet_apply(params, x, t, ctx, cfg)
    e2, _ = unet_apply(rec, x, t, ctx, cfg)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_ldm_unet_key_conversion_roundtrip():
    """our params → diffusers keys → LDM keys → back must be exact."""
    import numpy as np

    from adaface_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
    from adaface_tpu.tools.convert_ldm_unet import (
        convert_ldm_unet, ldm_unet_to_diffusers_keys)
    from adaface_tpu.tools.convert_sd import export_unet_to_diffusers

    cfg = UNetConfig(block_channels=(32, 64, 64, 64), cross_attn_dim=48,
                     num_heads=4, norm_groups=8)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    df = export_unet_to_diffusers(params, cfg)

    # re-emit in LDM naming by walking the known mapping tables
    from adaface_tpu.tools import convert_ldm_unet as m

    ldm_sd = {}

    def put(ldm_key, df_key):
        for suf in (".weight", ".bias"):
            if df_key + suf in df:
                ldm_sd["model.diffusion_model." + ldm_key + suf] = df[df_key + suf]

    put("time_embed.0", "time_embedding.linear_1")
    put("time_embed.2", "time_embedding.linear_2")
    put("input_blocks.0.0", "conv_in")
    put("out.0", "conv_norm_out")
    put("out.2", "conv_out")
    idx = 1
    for bi in range(4):
        for li in range(cfg.layers_per_block):
            for ls, ds in m.RESNET_MAP:
                put(f"input_blocks.{idx}.0.{ls}",
                    f"down_blocks.{bi}.resnets.{li}.{ds}")
            if cfg.down_has_attn[bi]:
                for ls, ds in m.ATTN_MAP:
                    put(f"input_blocks.{idx}.1.{ls}",
                        f"down_blocks.{bi}.attentions.{li}.{ds}")
            idx += 1
        if bi < 3:
            put(f"input_blocks.{idx}.0.op",
                f"down_blocks.{bi}.downsamplers.0.conv")
            idx += 1
    for ls, ds in m.RESNET_MAP:
        put(f"middle_block.0.{ls}", "mid_block.resnets.0." + ds)
        put(f"middle_block.2.{ls}", "mid_block.resnets.1." + ds)
    for ls, ds in m.ATTN_MAP:
        put(f"middle_block.1.{ls}", "mid_block.attentions.0." + ds)
    idx = 0
    for bi in range(4):
        for li in range(cfg.layers_per_block + 1):
            for ls, ds in m.RESNET_MAP:
                put(f"output_blocks.{idx}.0.{ls}",
                    f"up_blocks.{bi}.resnets.{li}.{ds}")
            if cfg.up_has_attn[bi]:
                for ls, ds in m.ATTN_MAP:
                    put(f"output_blocks.{idx}.1.{ls}",
                        f"up_blocks.{bi}.attentions.{li}.{ds}")
            if li == cfg.layers_per_block and bi < 3:
                sub = 2 if cfg.up_has_attn[bi] else 1
                put(f"output_blocks.{idx}.{sub}.conv",
                    f"up_blocks.{bi}.upsamplers.0.conv")
            idx += 1

    rec = convert_ldm_unet(ldm_sd, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32))
    t = jnp.array([42])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 48))
    e1, _ = unet_apply(params, x, t, ctx, cfg)
    e2, _ = unet_apply(rec, x, t, ctx, cfg)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
