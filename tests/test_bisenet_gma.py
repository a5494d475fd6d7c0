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
    make_feat_proj,
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
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64)) * 0.3
    flow_same = gma_flow(p, img, img, num_iters=3)
    assert flow_same.shape == (1, 2, 64, 64)
    assert np.isfinite(np.asarray(flow_same)).all()


def test_est_flow_from_feats():
    p = init_gma_params(jax.random.PRNGKey(0))
    proj = make_feat_proj(jax.random.PRNGKey(1), c_in=32)
    f1 = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64))
    f2 = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 64))
    flow = est_flow_from_feats(p, proj, f1, f2, 8, 8, num_iters=2)
    assert flow.shape == (1, 2, 8, 8)
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
