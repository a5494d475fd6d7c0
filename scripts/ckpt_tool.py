"""Checkpoint surgery CLI — one entry point for the reference's ckpt tools.

    python scripts/ckpt_tool.py repl_vae  base.safetensors vae.safetensors out.safetensors
    python scripts/ckpt_tool.py repl_text base.safetensors te.safetensors  out.safetensors
    python scripts/ckpt_tool.py avg       a.safetensors b.safetensors -o out.safetensors -w 0.5 0.5
    python scripts/ckpt_tool.py extract_unet sd.ckpt out.safetensors
    python scripts/ckpt_tool.py fp16      in.safetensors out.safetensors
    python scripts/ckpt_tool.py diff      a.safetensors b.safetensors
    python scripts/ckpt_tool.py check     in.safetensors
    python scripts/ckpt_tool.py repl_pat  base donor out -p 'unet.*attn*'

Replaces: scripts/{repl_vae,repl_textencoder,avg_models,extract_unet,
ckpt_fp32to16,modeldiff,chk_ckpt_weights,repl_by_pat}.py in the reference.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from adaface_tpu.tools.ckpt_lib import (  # noqa: E402
    average_state_dicts,
    cast_fp16,
    check_weights,
    extract_subtree,
    load_state_dict,
    model_diff,
    replace_by_pattern,
    replace_subtree,
    save_state_dict,
)

VAE_PREFIX = "first_stage_model."
TEXT_PREFIX = "cond_stage_model."
UNET_PREFIX = "model.diffusion_model."


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("repl_vae", "repl_text"):
        p = sub.add_parser(name)
        p.add_argument("base"), p.add_argument("donor"), p.add_argument("out")
        p.add_argument("--donor_prefix", default="")

    p = sub.add_parser("avg")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-w", "--weights", nargs="+", type=float, default=None)

    p = sub.add_parser("extract_unet")
    p.add_argument("base"), p.add_argument("out")
    p.add_argument("--prefix", default=UNET_PREFIX)

    p = sub.add_parser("fp16")
    p.add_argument("base"), p.add_argument("out")

    p = sub.add_parser("diff")
    p.add_argument("a"), p.add_argument("b")
    p.add_argument("--topk", type=int, default=20)

    p = sub.add_parser("check")
    p.add_argument("base")

    p = sub.add_parser("repl_pat")
    p.add_argument("base"), p.add_argument("donor"), p.add_argument("out")
    p.add_argument("-p", "--patterns", nargs="+", required=True)
    p.add_argument("--regex", action="store_true")

    args = ap.parse_args()

    if args.cmd in ("repl_vae", "repl_text"):
        prefix = VAE_PREFIX if args.cmd == "repl_vae" else TEXT_PREFIX
        base = load_state_dict(args.base)
        donor = load_state_dict(args.donor)
        out = replace_subtree(base, donor, prefix,
                              donor_prefix=args.donor_prefix or None)
        save_state_dict(out, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "avg":
        sds = [load_state_dict(p) for p in args.inputs]
        save_state_dict(average_state_dicts(sds, args.weights), args.out)
        print(f"averaged {len(sds)} ckpts → {args.out}")
    elif args.cmd == "extract_unet":
        sd = extract_subtree(load_state_dict(args.base), args.prefix)
        save_state_dict(sd, args.out)
        print(f"extracted {len(sd)} tensors → {args.out}")
    elif args.cmd == "fp16":
        save_state_dict(cast_fp16(load_state_dict(args.base)), args.out)
        print(f"wrote fp16 → {args.out}")
    elif args.cmd == "diff":
        rows, miss_a, miss_b = model_diff(
            load_state_dict(args.a), load_state_dict(args.b), args.topk)
        for k, d in rows:
            print(f"{d:12.6g}  {k}")
        if miss_a:
            print(f"only in b: {len(miss_a)} keys")
        if miss_b:
            print(f"only in a: {len(miss_b)} keys")
    elif args.cmd == "check":
        stats = check_weights(load_state_dict(args.base))
        print(stats)
    elif args.cmd == "repl_pat":
        out = replace_by_pattern(
            load_state_dict(args.base), load_state_dict(args.donor),
            args.patterns, use_regex=args.regex)
        save_state_dict(out, args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
