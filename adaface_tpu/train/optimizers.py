"""Optimizers as optax transforms.

Rebuilds of the reference's optimizer zoo (SURVEY §2.2):
- cautious_adamw — "cautious" AdamW (`ldm/c_adamw.py`): the first moment is
  masked wherever it disagrees in sign with the gradient (renormalized by
  the surviving fraction) before the Adam denom; weight decay unmasked.
  `cautious()` remains as a generic update-masking wrapper for composing
  with other inner transforms.
- prodigy — D-adaptation Adam (`ldm/prodigy.py`; Mishchenko & Defazio,
  "Prodigy: An Expeditiously Adaptive Parameter-Free Learner"): learns the
  distance-to-solution scale d on the fly.
- muon — Newton–Schulz orthogonalized momentum for ≥2-D weights with an aux
  AdamW for the rest (the reference pulls `MuonWithAuxAdam` from pip and
  gives matrix params 5× LR, `ddpm.py:3855-4020`).
- adam8bit — int8 block-quantized-moment Adam (the reference's
  bitsandbytes `Adam8bit` branch, rebuilt TPU-native).
- warmup_cosine — LambdaWarmUpCosineScheduler equivalent
  (`ldm/modules/lr_scheduler.py`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# cautious AdamW
# ---------------------------------------------------------------------------


def cautious(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Mask update components whose sign disagrees with the gradient
    (`ldm/c_adamw.py`), rescaled by 1/mean(mask)."""

    def init(params):
        return inner.init(params)

    def update(grads, state, params=None):
        updates, state = inner.update(grads, state, params)

        def mask(u, g):
            m = (u * g < 0).astype(u.dtype)  # optax updates are -lr*step
            # NOTE sign: optax updates are applied additively, while grads
            # point uphill — agreement means u and g have opposite signs.
            frac = m.mean()
            return u * m / jnp.maximum(frac, 1e-3)

        updates = jax.tree_util.tree_map(mask, updates, grads)
        return updates, state

    return optax.GradientTransformation(init, update)


class CAdamWState(NamedTuple):
    count: jax.Array
    m: optax.Updates
    v: optax.Updates


def cautious_adamw(
    lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.005
) -> optax.GradientTransformation:
    """Exact rebuild of the reference cautious AdamW (`ldm/c_adamw.py:
    90-122`, golden-tested): the sign-agreement mask compares the FIRST
    MOMENT with the gradient and is applied to exp_avg before the denom;
    decoupled weight decay is NOT masked; denom = sqrt(v)+eps with the
    bias corrections folded into the step size."""

    def init(params):
        z = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params)
        return CAdamWState(count=jnp.zeros((), jnp.int32), m=z,
                           v=jax.tree_util.tree_map(jnp.copy, z))

    def update(grads, state, params=None):
        count = state.count + 1
        lr_t = lr(state.count) if callable(lr) else lr
        t = count.astype(jnp.float32)
        step_size = lr_t * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

        def leaf(g, m, v, p):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            denom = jnp.sqrt(v) + eps
            mask = (m * g > 0).astype(g.dtype)
            mask = mask / jnp.maximum(mask.mean(), 1e-3)
            upd = -step_size * (m * mask) / denom
            if weight_decay and p is not None:
                upd = upd - lr_t * weight_decay * p
            return upd, m, v

        if params is None:
            params = jax.tree_util.tree_map(lambda g: None, grads)
        flat = jax.tree_util.tree_map(leaf, grads, state.m, state.v, params)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t_: t_[i], flat, is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), CAdamWState(count=count, m=pick(1), v=pick(2))

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Prodigy
# ---------------------------------------------------------------------------


class ProdigyState(NamedTuple):
    step: jax.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    s: optax.Updates
    p0: optax.Updates  # initial params
    d: jax.Array
    d_max: jax.Array
    numerator: jax.Array


def prodigy(
    lr=1.0,
    betas=(0.9, 0.999),
    beta3: float | None = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    growth_rate: float = float("inf"),
    safeguard_warmup: bool = False,
) -> optax.GradientTransformation:
    b1, b2 = betas
    if beta3 is None:
        beta3 = b2 ** 0.5

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            s=jax.tree_util.tree_map(jnp.zeros_like, params),
            p0=jax.tree_util.tree_map(lambda x: x, params),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            numerator=jnp.zeros((), jnp.float32),
        )

    def update(grads, state, params):
        d, step = state.d, state.step + 1
        # lr may be an optax schedule (Prodigy cyclic schedules,
        # `ddpm.py:3945-4003`); the scheduled factor scales dlr everywhere,
        # including the d-estimation statistics, matching torch where the
        # scheduler mutates the param-group lr that Prodigy reads.
        lr_t = lr(state.step) if callable(lr) else lr
        dlr = d * lr_t

        # numerator += (d / d0) * dlr * <g, p0 - p>
        dot = sum(
            jnp.vdot(g.astype(jnp.float32),
                     (p0 - p).astype(jnp.float32))
            for g, p0, p in zip(
                jax.tree_util.tree_leaves(grads),
                jax.tree_util.tree_leaves(state.p0),
                jax.tree_util.tree_leaves(params),
            )
        )
        numerator = state.numerator * beta3 + (d / d0) * dlr * dot

        s = jax.tree_util.tree_map(
            lambda s_, g: s_ * beta3 + g.astype(jnp.float32) * (d / d0) * dlr,
            state.s, grads,
        )
        s_l1 = sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(s))
        d_hat = jnp.where(s_l1 > 0, d_coef * numerator / (s_l1 + 1e-30), d)
        d_next = jnp.clip(jnp.maximum(d, d_hat), max=d * growth_rate)
        d_next = jnp.maximum(d_next, d)
        d_max = jnp.maximum(state.d_max, d_next)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: m * b1 + g * d * (1 - b1), state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: v * b2 + (g * d) ** 2 * (1 - b2), state.exp_avg_sq, grads)

        def upd(m, v, p):
            step_ = -dlr * m / (jnp.sqrt(v) + d * eps)
            if weight_decay > 0:
                step_ = step_ - dlr * weight_decay * p
            return step_

        updates = jax.tree_util.tree_map(upd, exp_avg, exp_avg_sq, params)
        return updates, ProdigyState(
            step=step, exp_avg=exp_avg, exp_avg_sq=exp_avg_sq, s=s,
            p0=state.p0, d=d_next, d_max=d_max, numerator=numerator,
        )

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Muon
# ---------------------------------------------------------------------------


def _newton_schulz(g: jax.Array, steps: int = 5, eps: float = 1e-7) -> jax.Array:
    """Orthogonalize via quintic Newton–Schulz iteration (public Muon)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.float32)
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)
    for _ in range(steps):
        xxt = x @ x.T
        x = a * x + (b * xxt + c * xxt @ xxt) @ x
    if transposed:
        x = x.T
    return x


class MuonState(NamedTuple):
    momentum: optax.Updates
    adam: optax.OptState
    step: jax.Array


def muon(
    lr=0.02,
    momentum: float = 0.95,
    nesterov: bool = True,
    adam_lr=3e-4,
    adam_b1: float = 0.9,
    adam_b2: float = 0.95,
    matrix_lr_mult: float = 1.0,
) -> optax.GradientTransformation:
    """Muon for ≥2-D weight matrices; AdamW for everything else.
    `lr`/`adam_lr` may be optax schedules (the reference reuses the AdamW
    LambdaLR warmup-cosine for Muon, `ddpm.py:3926-3931`)."""
    aux = optax.adam(adam_lr, b1=adam_b1, b2=adam_b2)

    def is_matrix(x):
        return x.ndim >= 2

    def init(params):
        mom = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p) if is_matrix(p) else None, params)
        aux_params = jax.tree_util.tree_map(
            lambda p: p if not is_matrix(p) else jnp.zeros((), p.dtype), params)
        return MuonState(momentum=mom, adam=aux.init(aux_params),
                         step=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        lr_t = lr(state.step) if callable(lr) else lr
        new_mom = jax.tree_util.tree_map(
            lambda m, g: m * momentum + g if m is not None else None,
            state.momentum, grads, is_leaf=lambda x: x is None,
        )

        def muon_update(m, g):
            if m is None:
                return None
            eff = g + momentum * m if nesterov else m
            mat = eff.reshape(eff.shape[0], -1)
            o = _newton_schulz(mat).reshape(eff.shape)
            scale = max(1.0, eff.shape[0] / max(mat.shape[1], 1)) ** 0.5
            return -lr_t * matrix_lr_mult * scale * o.astype(g.dtype)

        muon_updates = jax.tree_util.tree_map(
            muon_update, new_mom, grads, is_leaf=lambda x: x is None)

        aux_grads = jax.tree_util.tree_map(
            lambda g, m: g if m is None else jnp.zeros((), g.dtype),
            grads, state.momentum, is_leaf=lambda x: x is None)
        aux_updates, aux_state = aux.update(aux_grads, state.adam)

        updates = jax.tree_util.tree_map(
            lambda mu, au: au if mu is None else mu,
            muon_updates, aux_updates, is_leaf=lambda x: x is None)
        return updates, MuonState(momentum=new_mom, adam=aux_state,
                                  step=state.step + 1)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# 8-bit Adam
# ---------------------------------------------------------------------------


class Adam8bitState(NamedTuple):
    count: jax.Array
    moments: optax.Updates  # per-leaf dict: fp32 {m,v} or int8 {qm,sm,qv,sv}


def adam8bit(
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 256,
    min_8bit_size: int = 4096,
) -> optax.GradientTransformation:
    """Adam with int8 block-quantized moments (the reference's
    `bnb.optim.Adam8bit` branch, `ddpm.py:3855-4020`). bitsandbytes is
    CUDA-only; this is the TPU-native equivalent: each moment tensor is
    stored as int8 with one f32 absmax scale per `block_size` block
    (linear quantization instead of bnb's dynamic-tree map — simpler and
    XLA-fusable; the per-block scale bounds the quantization error the
    same way). Leaves smaller than `min_8bit_size` keep fp32 state,
    matching bnb's `min_8bit_size` behavior. State HBM for large leaves
    drops 4x (8.25 bits/moment vs 32)."""

    def _nblocks(n):
        return (n + block_size - 1) // block_size

    def _quant(x):
        """f32 [...]→ (int8 [nb, B], f32 [nb]) with per-block absmax."""
        n = x.size
        nb = _nblocks(n)
        xf = jnp.pad(x.reshape(-1), (0, nb * block_size - n))
        xb = xf.reshape(nb, block_size)
        scale = jnp.max(jnp.abs(xb), axis=1)
        q = jnp.round(xb * (127.0 / jnp.maximum(scale, 1e-30))[:, None])
        return q.astype(jnp.int8), scale

    def _dequant(q, scale, shape):
        x = q.astype(jnp.float32) * (scale * (1.0 / 127.0))[:, None]
        n = 1
        for s in shape:
            n *= s
        return x.reshape(-1)[:n].reshape(shape)

    def leaf_init(p):
        if p.size < min_8bit_size:
            z = jnp.zeros(p.shape, jnp.float32)
            return {"m": z, "v": z}
        nb = _nblocks(p.size)
        return {
            "qm": jnp.zeros((nb, block_size), jnp.int8),
            "sm": jnp.zeros((nb,), jnp.float32),
            "qv": jnp.zeros((nb, block_size), jnp.int8),
            "sv": jnp.zeros((nb,), jnp.float32),
        }

    def init(params):
        moments = jax.tree_util.tree_map(leaf_init, params)
        return Adam8bitState(count=jnp.zeros((), jnp.int32), moments=moments)

    def update(grads, state, params=None):
        count = state.count + 1
        lr_t = lr(state.count) if callable(lr) else lr
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, s, p):
            out_dtype = g.dtype
            g = g.astype(jnp.float32)
            if "m" in s:
                m, v = s["m"], s["v"]
            else:
                m = _dequant(s["qm"], s["sm"], g.shape)
                v = _dequant(s["qv"], s["sv"], g.shape)
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            upd = -lr_t * ((m / c1) / (jnp.sqrt(v / c2) + eps))
            if weight_decay and p is not None:
                upd = upd - lr_t * weight_decay * p.astype(jnp.float32)
            if "m" in s:
                new_s = {"m": m, "v": v}
            else:
                qm, sm = _quant(m)
                qv, sv = _quant(v)
                new_s = {"qm": qm, "sm": sm, "qv": qv, "sv": sv}
            return upd.astype(out_dtype), new_s

        if params is None:
            flat = jax.tree_util.tree_map(
                lambda g, s: leaf(g, s, None), grads, state.moments)
        else:
            flat = jax.tree_util.tree_map(leaf, grads, state.moments, params)
        # unzip the (update, new_state) leaf tuples
        updates = jax.tree_util.tree_map(
            lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        moments = jax.tree_util.tree_map(
            lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return updates, Adam8bitState(count=count, moments=moments)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def warmup_cosine(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    lr_min: float = 0.0,
    lr_start: float = 0.0,
) -> optax.Schedule:
    """LambdaWarmUpCosineScheduler (`ldm/modules/lr_scheduler.py`)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(lr_start, base_lr, warmup_steps),
            optax.cosine_decay_schedule(
                base_lr, max(total_steps - warmup_steps, 1),
                alpha=lr_min / max(base_lr, 1e-12)),
        ],
        [warmup_steps],
    )


def prodigy_cycle_schedule(
    warm_up_steps: int,
    total_steps: int,
    scheduler_cycles: float = 1,
    scheduler_type: str = "Linear",
):
    """LR-factor schedule for Prodigy, rebuilding the reference's
    `SequentialLR2` composition (`ddpm.py:3945-4003`,
    `ldm/modules/lr_scheduler.py` SequentialLR2): a constant-1 warmup for
    `warm_up_steps`, then `scheduler_cycles` cycles over the remaining
    steps. Cycle types:

    - ``Linear``: PolynomialLR(power=1) per cycle with total_iters =
      cycle_steps * 1.1, so each cycle ends at 1 - 1/1.1 ≈ 0.09 of full LR
      and restarts at 1 (the last cycle absorbs the remainder).
    - ``CosineAnnealingWarmRestarts``: eta_min = 0.1, T_0 = cycle steps.
    - ``CyclicLR``: triangle between 0.1 and 1 with half-period
      cycle_steps/2, starting AT the peak and descending first (the
      reference offsets last_epoch by half a cycle); cycle count is
      reduced by 0.5 to keep the total length.
    """
    total_cycle = float(max(total_steps - warm_up_steps, 1))
    num = float(scheduler_cycles)
    if scheduler_type == "CyclicLR":
        num -= 0.5
    num = max(num, 0.5)
    single = total_cycle / num

    def sched(step):
        t = jnp.maximum(step - warm_up_steps, 0).astype(jnp.float32)
        if scheduler_type == "Linear":
            n_int = max(int(scheduler_cycles), 1)
            idx = jnp.minimum(jnp.floor(t / single), n_int - 1)
            t_c = t - idx * single
            last_len = total_cycle - single * (n_int - 1)
            cyc_len = jnp.where(idx == n_int - 1, last_len, single)
            f = jnp.clip(1.0 - t_c / (cyc_len * 1.1), 0.0, 1.0)
        elif scheduler_type == "CosineAnnealingWarmRestarts":
            t_c = jnp.mod(t, single)
            f = 0.1 + 0.45 * (1.0 + jnp.cos(jnp.pi * t_c / single))
        elif scheduler_type == "CyclicLR":
            half = single / 2.0
            pos = jnp.mod(t / half, 2.0)  # 0 at the peak, 1 at the trough
            tri = jnp.where(pos <= 1.0, 1.0 - pos, pos - 1.0)
            f = 0.1 + 0.9 * tri
        else:
            raise ValueError(f"unknown scheduler_type '{scheduler_type}'")
        return jnp.where(step < warm_up_steps, 1.0, f)

    return sched


def make_optimizer(
    name: str,
    lr: float,
    warmup_steps: int = 600,
    total_steps: int = 120_000,
    grad_clip: float = 0.2,
    weight_decay: float = 0.005,
    **kw,
) -> optax.GradientTransformation:
    """Optimizer factory mirroring `configure_optimizers`
    (`ddpm.py:3855-4020`): grad clip 0.2 + warmup-cosine LR."""
    sched = warmup_cosine(lr, warmup_steps, total_steps)
    if name in ("cadamw", "cautious_adamw"):
        core = cautious_adamw(sched, weight_decay=weight_decay)
    elif name == "adamw":
        core = optax.adamw(sched, weight_decay=weight_decay)
    elif name == "nadam":
        core = optax.nadamw(sched, weight_decay=weight_decay)
    elif name == "adam8bit":
        core = adam8bit(sched, weight_decay=weight_decay, **kw)
    elif name == "prodigy":
        # Prodigy runs at lr=1 scaled by the cyclic schedule; weight decay
        # is disabled in the reference's Prodigy branch (`ddpm.py:3938`)
        cycles = kw.pop("scheduler_cycles", 1)
        sched_type = kw.pop("scheduler_type", "Linear")
        lr_sched = prodigy_cycle_schedule(
            warmup_steps, total_steps, cycles, sched_type)
        kw.setdefault("safeguard_warmup", cycles > 1)
        kw.setdefault("betas", (0.985, 0.993))
        core = prodigy(lr=lr_sched, **kw)
    elif name == "muon":
        # matrix params take 5x LR (`ddpm.py:3918-3924`), and Muon reuses
        # the AdamW warmup-cosine schedule (`ddpm.py:3926-3931`)
        kw.setdefault("matrix_lr_mult", 5.0)
        core = muon(lr=sched, adam_lr=sched, **kw)
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    return optax.chain(optax.clip_by_global_norm(grad_clip), core)
