"""Int8 post-training quantization for the serving path.

TPU v5e executes int8×int8→int32 contractions on the MXU at twice the
bf16 rate (394 TOPS vs 197 TFLOPS). The SD1.5 UNet's 3×3 convolutions
are the dominant cost of a sampling step and already run at 52–71% of
the bf16 envelope, so weight+activation int8 is the one remaining lever
with a large theoretical ceiling.

Scheme (standard PTQ, no reference equivalent — the reference serves
fp16, `adaface_wrapper.py`):

- **weights**: per-output-channel symmetric int8, quantized once offline
  (`quantize_unet_params`); first/last convs and the time embedding stay
  high-precision by default (the usual quality-critical layers).
- **activations**: dynamic per-tensor symmetric int8 computed in-graph
  (amax → scale → round). No calibration data needed.
- conv/dense run `lax.conv_general_dilated` / `lax.dot_general` on int8
  operands with `preferred_element_type=int32`, then dequantize with the
  product of the two scales. Norms, attention softmax, and all residual
  arithmetic stay bf16/fp32.

Inference-only: the int8 ops are not differentiable (training always
uses the bf16 path).

Measured (v5e, 25-step UNet scan @ CFG batch 64, interleaved timing with
warm-up rounds discarded, 2026-08-18): bf16 540 ms/step, int8 conv-only
500 ms/step (1.08×), int8 conv+dense 518 ms/step — the dense layers'
dynamic-quant overhead outweighs their MXU gain, so conv-only is the
default. Output parity vs bf16 on the full SD1.5 UNet: corr 0.9988,
max-rel 0.11.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# param subtrees kept in bf16 (quality-critical, negligible FLOPs)
DEFAULT_SKIP = ("conv_in", "conv_out", "time_mlp")


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8. w: [..., O] (HWIO conv or IO
    dense; the last axis is the output channel). Returns (w_q int8,
    scale f32 [O])."""
    wf = jnp.asarray(w, jnp.float32)
    red = tuple(range(wf.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=red)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _quantize_act(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8 of an activation tensor."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_conv2d(p: Params, x: jax.Array, stride: int = 1, padding=1) -> jax.Array:
    """Quantized drop-in for models.unet.conv2d: p holds
    {'w_q' int8 HWIO, 'w_scale' f32 [O], 'b'}."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    x_q, x_scale = _quantize_act(x)
    y = jax.lax.conv_general_dilated(
        x_q,
        p["w_q"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * p["w_scale"])
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def int8_dense(p: Params, x: jax.Array) -> jax.Array:
    """Quantized drop-in for models.unet.dense: {'w_q' int8 [I,O],
    'w_scale' [O], 'b'}."""
    x_q, x_scale = _quantize_act(x)
    y = jax.lax.dot_general(
        x_q, p["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * p["w_scale"])
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _is_conv_or_dense(d: dict) -> bool:
    return (
        isinstance(d, dict)
        and "w" in d
        and "b" in d
        and hasattr(d["w"], "ndim")
        and d["w"].ndim in (2, 4)
    )


def quantize_unet_params(
    params: Params,
    skip: tuple[str, ...] = DEFAULT_SKIP,
    quantize_dense: bool = False,
) -> Params:
    """Walk the UNet param tree; replace conv (and optionally dense)
    {'w','b'} leaves with int8 {'w_q','w_scale','b'}. Subtrees whose path
    contains a name in `skip` are left untouched."""

    def walk(node, path):
        if isinstance(node, dict):
            if any(s in path for s in skip):
                return node
            if _is_conv_or_dense(node):
                if node["w"].ndim == 2 and not quantize_dense:
                    return node
                w_q, scale = quantize_weight(node["w"])
                out = {k: v for k, v in node.items() if k != "w"}
                out["w_q"] = w_q
                out["w_scale"] = scale
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (str(i),))
                              for i, v in enumerate(node))
        return node

    return walk(params, ())
