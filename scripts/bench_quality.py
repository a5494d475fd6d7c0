"""Quality gate for the serving "turbo" modes (VERDICT r3 #7).

Runs bench.py twice in subprocesses — (a) the bf16 reference config and
(b) a turbo config (int8 PTQ and/or DeepCache/ToMe via the usual env
knobs) — with the SAME seeds, then compares the generated batches by:

- ArcFace-embedding cosine (models/arcface.py on the face-crop center
  of each 512² image): an identity-preservation metric, not a latent
  correlation. NOTE: until real arcface-resnet18 weights are converted
  (BASELINE.md acquisition plan), the tower is random-init, which makes
  this a random-CNN perceptual-drift proxy — still far stricter than
  pixel/latent correlation (random conv features are a standard
  perceptual-distance surrogate), and the code path is exactly what the
  real weights will use.
- pixel MAE / correlation for continuity with the r2/r3 records.

Separate subprocesses because the axon relay dies silently on a second
large compile in one process (measured, .claude/skills/verify).

Usage:
  python scripts/bench_quality.py                # bf16 vs int8+DeepCache(5)
  TURBO_ENV="ADAFACE_BENCH_TOME=0.5" python scripts/bench_quality.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(out_path: str, extra_env: dict) -> dict | None:
    env = dict(os.environ)
    env.update(extra_env)
    env["ADAFACE_BENCH_SAVE_OUT"] = out_path
    env["ADAFACE_BENCH_P50"] = "0"  # one compile per process
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, env=env)
    sys.stderr.write(r.stderr)
    result = None
    for line in r.stdout.splitlines():
        if line.strip().startswith("{"):
            result = json.loads(line)
    if r.returncode != 0 or result is None:
        print(f"# bench run failed rc={r.returncode}", file=sys.stderr)
    return result


def _arcface_cosine(a_imgs, b_imgs) -> float:
    """Mean cosine between embeddings of matched images (center 256²
    crop → grayscale 128² — the arcface input convention)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    from adaface_tpu.models.arcface import arcface_embed, init_arcface_params

    params = init_arcface_params(jax.random.PRNGKey(0))

    def embed(imgs):
        # imgs [B, 3, H, W] in [0, 1] (pipeline output) → center crop →
        # grayscale 128² in [-1, 1] (the arcface input convention)
        x = jnp.asarray(imgs, jnp.float32)
        h, w = x.shape[2:4]
        ch, cw = h // 4, w // 4
        x = x[:, :, ch:h - ch, cw:w - cw]
        gray = (x * jnp.asarray([0.299, 0.587, 0.114])[None, :, None, None]
                ).sum(1)
        gray = jax.image.resize(gray, (x.shape[0], 128, 128), "linear")
        gray = (gray - 0.5) / 0.5
        emb = arcface_embed(params, gray[:, None])
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    ea, eb = np.asarray(embed(a_imgs)), np.asarray(embed(b_imgs))
    return float((ea * eb).sum(-1).mean())


def main():
    import numpy as np

    ref_npz = "/tmp/bench_ref_out.npz"
    turbo_npz = "/tmp/bench_turbo_out.npz"
    turbo_env = {}
    for pair in os.environ.get(
            "TURBO_ENV",
            "ADAFACE_BENCH_INT8=1 ADAFACE_BENCH_DEEPCACHE=5").split():
        k, v = pair.split("=", 1)
        turbo_env[k] = v

    ref = _run_bench(ref_npz, {"ADAFACE_BENCH_INT8": "0",
                               "ADAFACE_BENCH_DEEPCACHE": "0",
                               "ADAFACE_BENCH_TOME": "0"})
    turbo = _run_bench(turbo_npz, turbo_env)
    if ref is None or turbo is None:
        sys.exit(1)

    a = np.load(ref_npz)["images"].astype(np.float32)
    b = np.load(turbo_npz)["images"].astype(np.float32)
    mae = float(np.abs(a - b).mean())
    corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    cos = _arcface_cosine(a, b)

    print(json.dumps({
        "metric": "turbo_quality_gate",
        "turbo_env": turbo_env,
        "ref_imgs_per_sec": ref["value"],
        "turbo_imgs_per_sec": turbo["value"],
        "speedup": round(turbo["value"] / ref["value"], 3),
        "arcface_cosine": round(cos, 4),
        "pixel_mae": round(mae, 5),
        "pixel_corr": round(corr, 5),
        "ref_spread": ref.get("iter_sec_spread"),
        "turbo_spread": turbo.get("iter_sec_spread"),
    }))


if __name__ == "__main__":
    main()
