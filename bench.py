"""Headline benchmark: personalized 512² generation throughput on one chip.

Runs the full inference pipeline (prompt encode → 25-step CFG DDIM UNet
loop → VAE decode) at batch 4 with random SD1.5-sized weights (weights do
not affect speed) and prints ONE JSON line.

Baseline: the driver north star is ≥2,000 personalized 512² 25-step
generations/hour/chip (BASELINE.md) = 0.5556 imgs/sec/chip.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # reload the UNet-loop executable across runs

BASELINE_IMGS_PER_SEC = 2000.0 / 3600.0


def main():
    from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules

    # throughput configuration: batch 32 measured best on v5e
    # (bs4: 1.24, bs8: 1.42, bs16: 1.58, bs32: 1.71 imgs/s)
    batch = 32
    steps = 25
    # init on host CPU (device-side init dispatches hundreds of tiny ops
    # through the relay: measured 730s vs seconds on host), then ship once
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        modules = PipelineModules.random_init(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    for name in ("unet", "vae", "text_encoder"):
        setattr(modules, name,
                jax.device_put(getattr(modules, name), dev))
    # ADAFACE_BENCH_INT8=1 switches to the int8 PTQ serving mode
    # (ops/quant.py: +8% measured, corr 0.9988 vs bf16; default bf16 so the
    # headline reflects full-precision output)
    pipe = DiffusionPipeline(
        modules,
        quantize_unet=os.environ.get("ADAFACE_BENCH_INT8", "0") == "1")

    prompt = "portrait photo of z person at the beach, high quality"

    # ADAFACE_BENCH_DEEPCACHE=N (N>1) enables encoder caching (full UNet
    # every Nth step; measured 1.39x @3 / 1.54x @5, corr 0.99999); default
    # 0 so the headline reflects the full-computation loop
    dc = int(os.environ.get("ADAFACE_BENCH_DEEPCACHE", "0"))
    # ADAFACE_BENCH_TOME=R (0<R<1) enables ToMe token merging (ops/tome.py);
    # default 0 so the headline reflects the full-resolution loop
    tome = float(os.environ.get("ADAFACE_BENCH_TOME", "0"))

    def run(seed):
        return pipe(
            [prompt] * batch,
            negative_prompt="lowres, low quality",
            num_inference_steps=steps,
            guidance_scale=6.0,
            rng=jax.random.PRNGKey(seed),
            deepcache_interval=dc,
            tome_ratio=tome,
        )

    # warm-up: compile + relay warm-up (discard)
    t_start = time.perf_counter()
    img = run(0)
    _ = np.asarray(img[:1, :1, :1, :1])

    # median-of-N with per-iteration forced sync and recorded spread
    # (VERDICT r3: the relay showed ±40% day variance; a single grouped
    # number hides it)
    n_iters = int(os.environ.get("ADAFACE_BENCH_ITERS", "5"))
    times = []
    for i in range(1, n_iters + 1):
        t0 = time.perf_counter()
        img = run(i)
        _ = np.asarray(img[:1, :1, :1, :1])  # host readback forces sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    imgs_per_sec = batch / dt

    # optional output capture for the cross-mode quality gate
    # (scripts/bench_quality.py compares bf16 vs int8/DeepCache outputs
    # by ArcFace-embedding cosine; separate processes because the relay
    # dies silently on a second large compile in one process)
    save_out = os.environ.get("ADAFACE_BENCH_SAVE_OUT")
    if save_out:
        np.savez_compressed(save_out,
                            images=np.asarray(img, np.float16))
        print(f"# saved output batch -> {save_out}")

    # p50 single-request e2e latency (bs=1, compile excluded) — the second
    # metric of the BASELINE.json triple. Guarded two ways so the headline
    # line always prints inside the driver's window: skipped when the
    # throughput phase already ate the time budget (the bs=1 pipeline is a
    # second full compile through the relay), and wrapped against errors.
    p50_ms = None
    budget_s = float(os.environ.get("ADAFACE_BENCH_BUDGET_S", "1500"))
    if time.perf_counter() - t_start > budget_s:
        print(f"# skipping p50: throughput phase exceeded {budget_s:.0f}s budget")
    elif os.environ.get("ADAFACE_BENCH_P50", "1") == "1":
        try:
            def run1(seed):
                return pipe(
                    [prompt], negative_prompt="lowres, low quality",
                    num_inference_steps=steps, guidance_scale=6.0,
                    rng=jax.random.PRNGKey(seed), deepcache_interval=dc,
                    tome_ratio=tome)

            img = run1(0)  # compile (discard)
            _ = np.asarray(img[:1, :1, :1, :1])
            lats = []
            for i in range(1, 6):
                t0 = time.perf_counter()
                img = run1(i)
                _ = np.asarray(img[:1, :1, :1, :1])  # forced host readback
                lats.append(time.perf_counter() - t0)
            p50_ms = round(float(np.median(lats)) * 1000.0, 1)
        except Exception as e:  # pragma: no cover - relay-dependent
            print(f"# p50 measurement failed: {e!r}")

    print(json.dumps({
        "metric": "personalized_gen_512_25step_throughput",
        "value": round(imgs_per_sec, 4),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        "p50_latency_ms_bs1": p50_ms,
        "iter_sec_spread": {
            "median": round(dt, 3),
            "min": round(float(np.min(times)), 3),
            "max": round(float(np.max(times)), 3),
            "n": n_iters,
        },
    }))


if __name__ == "__main__":
    main()
