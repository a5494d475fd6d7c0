"""Golden parity for optimizers against the reference torch implementations.

Runs the reference `ldm/prodigy.py` (D-adaptation Adam) and
`ldm/c_adamw.py` (cautious AdamW) side by side with our optax transforms
on the same quadratic and identical gradients; trajectories must agree.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from adaface_tpu.train.optimizers import cautious_adamw, prodigy


def _ref_path():
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")


def _run_torch(opt_cls, steps, dim=6, lr=1.0, **kw):
    torch.manual_seed(0)
    target = torch.arange(1.0, dim + 1)
    w = torch.nn.Parameter(torch.zeros(dim, dim))
    opt = opt_cls([w], lr=lr, **kw)
    traj = []
    for _ in range(steps):
        opt.zero_grad()
        loss = ((w @ torch.ones(dim) - target) ** 2).mean()
        loss.backward()
        opt.step()
        traj.append(float(loss))
    return np.asarray(traj), w.detach().numpy()


def _run_ours(opt, steps, dim=6):
    target = jnp.arange(1.0, dim + 1)
    params = {"w": jnp.zeros((dim, dim))}

    def loss_fn(p):
        return ((p["w"] @ jnp.ones(dim) - target) ** 2).mean()

    state = opt.init(params)
    traj = []
    for _ in range(steps):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(float(loss))
    return np.asarray(traj), np.asarray(params["w"])


def test_prodigy_matches_reference():
    _ref_path()
    try:
        from ldm.prodigy import Prodigy
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    ref_traj, ref_w = _run_torch(Prodigy, steps=40, lr=1.0,
                                 weight_decay=0.0)
    our_traj, our_w = _run_ours(prodigy(lr=1.0, betas=(0.9, 0.999)),
                                steps=40)
    np.testing.assert_allclose(our_traj, ref_traj, rtol=1e-3)
    np.testing.assert_allclose(our_w, ref_w, atol=1e-4)


def test_cautious_adamw_matches_reference():
    _ref_path()
    try:
        from ldm.c_adamw import AdamW as CAdamW
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    ref_traj, ref_w = _run_torch(CAdamW, steps=40, lr=0.05,
                                 weight_decay=0.01)
    our_traj, our_w = _run_ours(
        cautious_adamw(0.05, weight_decay=0.01), steps=40)
    np.testing.assert_allclose(our_traj, ref_traj, rtol=1e-3)
    # the sign mask flips on fp32 ties (m·g ≈ 0), so exact-step agreement
    # drifts slightly; the algorithm is otherwise identical
    np.testing.assert_allclose(our_w, ref_w, atol=1e-3)
