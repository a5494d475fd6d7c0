"""Serving-path latency/throughput under concurrent multi-subject load
(VERDICT r4 #8).

Drives `inference/serving.py`'s ContinuousBatcher with M personalized
requests (distinct prompts + per-request ada embeddings, i.e. different
subjects sharing one device batch) queued up front, and records:
  - steady-state throughput (imgs/sec) over the drain,
  - per-request completion latency p50/p99 (queue wait included — the
    "loaded server" number),
  - per-wave completion gap p50/p99 (the inter-completion cadence).

Anchor: `app.py` + BASELINE.json config 3 ("continuous device
batching"); the reference serves one request at a time on a GPU Space
(`app.py:@spaces.GPU`).

  python scripts/bench_serving.py                  # 16 slots, 48 reqs
  BENCH_SERVE_SLOTS=8 BENCH_SERVE_REQS=24 python scripts/bench_serving.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaface_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

SLOTS = int(os.environ.get("BENCH_SERVE_SLOTS", "16"))
REQS = int(os.environ.get("BENCH_SERVE_REQS", "48"))
STEPS = int(os.environ.get("BENCH_SERVE_STEPS", "25"))

PROMPTS = [
    "a photo of {} at the beach",
    "a portrait of {} in a library, cinematic lighting",
    "{} riding a bike in paris",
    "a watercolor painting of {}",
    "{} as an astronaut on the moon",
    "a photo of {} cooking in a kitchen",
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adaface_tpu.inference.pipeline import PipelineModules
    from adaface_tpu.inference.serving import ContinuousBatcher, Request
    from adaface_tpu.models.clip import CLIP_L_TEXT, init_text_params
    from adaface_tpu.models.unet import SD15_UNET, init_unet_params
    from adaface_tpu.models.vae import init_vae_params
    from adaface_tpu.text.tokenizer import default_tokenizer

    rng = jax.random.PRNGKey(0)
    tok = default_tokenizer()
    print(f"# init towers (host)...", file=sys.stderr)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        unet = init_unet_params(jax.random.fold_in(rng, 1), SD15_UNET)
        text = init_text_params(jax.random.fold_in(rng, 2), CLIP_L_TEXT)
        vae = init_vae_params(jax.random.fold_in(rng, 3))
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    dev = jax.devices()[0]
    unet = jax.device_put(bf16(unet), dev)
    text = jax.device_put(bf16(text), dev)
    vae = jax.device_put(bf16(vae), dev)

    # placeholder rows for ada splicing: reuse the last k_id vocab ids
    k_id = 16
    ph_ids = list(range(CLIP_L_TEXT.vocab_size - k_id,
                        CLIP_L_TEXT.vocab_size))
    modules = PipelineModules(unet=unet, vae=vae, text_encoder=text,
                              tokenizer=tok)
    b = ContinuousBatcher(modules, num_slots=SLOTS,
                          num_inference_steps=STEPS,
                          placeholder_token_ids=ph_ids)

    key = jax.random.PRNGKey(7)
    subjects = [np.asarray(jax.random.normal(
        jax.random.fold_in(key, s), (k_id, CLIP_L_TEXT.hidden_size)))
        * 0.02 for s in range(6)]
    ph = "".join(f"<z{i}>" for i in range(k_id))  # tokenizer-dependent; the
    # batcher splices by placeholder ids, the prompt just needs length —
    # use a plain subject word so the char-fallback/BPE both tokenize
    reqs = []
    for i in range(REQS):
        p = PROMPTS[i % len(PROMPTS)].format("person")
        reqs.append(Request(prompt=p, negative_prompt="blurry",
                            ada_embs=subjects[i % len(subjects)],
                            guidance_scale=6.0, seed=i))
    _ = ph

    # warm: one tiny drain to compile step/encode/decode
    print("# compile warmup...", file=sys.stderr)
    t0 = time.perf_counter()
    for rid, img in b.generate_all([reqs[0]]).items():
        assert np.isfinite(img).all()
    print(f"# warmup done {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # loaded drain
    for r in reqs:
        b.submit(r)
    t_start = time.perf_counter()
    lat, gaps, last = [], [], None
    n_done = 0
    for rid, img in b.run():
        now = time.perf_counter()
        lat.append(now - t_start)
        if last is not None:
            gaps.append(now - last)
        last = now
        n_done += 1
    total = time.perf_counter() - t_start
    lat = np.asarray(lat)
    gaps = np.asarray(gaps) if gaps else np.zeros((1,))
    result = {
        "metric": "serving_throughput_loaded",
        "value": round(n_done / total, 4),
        "unit": f"imgs/sec ({SLOTS} slots, {STEPS} steps, {REQS} queued "
                "multi-subject requests)",
        "total_sec": round(total, 1),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
        "latency_p99_s": round(float(np.percentile(lat, 99)), 2),
        "completion_gap_p50_s": round(float(np.percentile(gaps, 50)), 3),
        "completion_gap_p99_s": round(float(np.percentile(gaps, 99)), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
