"""Stage-level profiling of the inference pipeline on the real chip.

Times each stage of the bench configuration separately so perf work is
profile-guided (VERDICT r1 #10): text encode, one UNet call (B=2*batch,
CFG-batched), the full 25-step DDIM loop, and VAE decode. Also derives
the UNet MFU from an analytic FLOP count via jax cost analysis.

Usage: python scripts/profile_pipeline.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force a host readback: through the axon relay, block_until_ready
    returns before remote execution finishes (bench.py works around the
    same), so sync on a tiny device->host copy instead."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules
    from adaface_tpu.models.unet import SD15_UNET, unet_apply
    from adaface_tpu.models.vae import vae_decode

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        modules = PipelineModules.random_init(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    for name in ("unet", "vae", "text_encoder"):
        setattr(modules, name, jax.device_put(getattr(modules, name), dev))
    pipe = DiffusionPipeline(modules)

    prompt = "portrait photo of z person at the beach, high quality"
    prompts = [prompt] * batch

    # --- text encode ---
    enc = jax.jit(lambda p, ids: __import__(
        "adaface_tpu.models.clip", fromlist=["text_encode"]).text_encode(
            p, ids, modules.text_cfg)["last_hidden_state"])
    ids = jnp.asarray(modules.tokenizer(prompts, max_length=77))
    t_text, _ = timeit(enc, modules.text_encoder, ids)

    # --- single UNet call at CFG batch ---
    b2 = 2 * batch
    x = jnp.zeros((b2, 4, 64, 64), jnp.bfloat16)
    t = jnp.full((b2,), 500, jnp.int32)
    ctx = jnp.zeros((b2, 77, 768), jnp.bfloat16)
    ufn = jax.jit(lambda p, x, t, c: unet_apply(p, x, t, c, SD15_UNET)[0])
    t_unet, _ = timeit(ufn, modules.unet, x, t, ctx)
    lowered = jax.jit(
        lambda p, x, t, c: unet_apply(p, x, t, c, SD15_UNET)[0]
    ).lower(modules.unet, x, t, ctx)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")

    # --- full loop (return latents; no decode) ---
    def loop(seed):
        return pipe(prompts, negative_prompt="lowres, low quality",
                    num_inference_steps=25, guidance_scale=6.0,
                    rng=jax.random.PRNGKey(seed), return_latents=True)

    t_loop, z0 = timeit(loop, 1, n=2)
    # pipe() re-encodes the prompt internally; take it out of the loop
    # timing so the stage shares don't double-count text encode
    t_loop = max(t_loop - 2 * t_text, 0.0)  # cond + uncond encodes

    # --- VAE decode ---
    dec = jax.jit(lambda p, z: vae_decode(p, z, modules.vae_cfg))
    t_dec, _ = timeit(dec, modules.vae, z0)

    total = t_loop + t_dec + 2 * t_text
    print(f"batch={batch}")
    print(f"text encode       : {t_text*1e3:9.1f} ms ({t_text/total:5.1%})")
    print(f"1 UNet call (B{b2}) : {t_unet*1e3:9.1f} ms"
          f"  flops={flops/1e12:.2f}T  mfu@197T={flops/t_unet/197e12:5.1%}")
    print(f"25-step DDIM loop : {t_loop*1e3:9.1f} ms ({t_loop/total:5.1%})"
          f"  [25x unet = {25*t_unet*1e3:.1f} ms -> loop overhead "
          f"{(t_loop-25*t_unet)*1e3:.1f} ms]")
    print(f"VAE decode        : {t_dec*1e3:9.1f} ms ({t_dec/total:5.1%})")
    print(f"total             : {total*1e3:9.1f} ms"
          f"  -> {batch/total:.3f} imgs/s")


if __name__ == "__main__":
    main()
