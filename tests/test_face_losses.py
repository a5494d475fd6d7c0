import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaface_tpu.models.arcface import (
    arcface_embed,
    convert_arcface_state_dict,
    init_arcface_params,
)
from adaface_tpu.train.face_losses import (
    bilinear_crop,
    calc_arcface_align_loss,
    detect_face_bboxes,
    embed_face_crops,
    gradient_mask,
)


@pytest.fixture(scope="module")
def arc_params():
    return init_arcface_params(jax.random.PRNGKey(0))


def test_arcface_shapes_and_param_count(arc_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 128, 128))
    emb = arcface_embed(arc_params, x)
    assert emb.shape == (2, 512)
    assert np.isfinite(np.asarray(emb)).all()
    n = sum(p.size for p in jax.tree_util.tree_leaves(arc_params))
    # torch resnet_face18(use_se=True) ≈ 24.8M params (incl. BN stats)
    assert 2e7 < n < 3.5e7, n


def test_arcface_torch_parity(arc_params):
    """Golden test against a from-scratch torch replica of the reference
    architecture is infeasible without the ckpt; instead verify the
    converter round-trips our own export of the torch layout."""
    # export to the torch naming and re-import
    sd = {}

    def put_conv(p, d):
        sd[f"{p}.weight"] = np.asarray(d["w"]).transpose(3, 2, 0, 1)

    def put_bn(p, d):
        sd[f"{p}.weight"] = np.asarray(d["scale"])
        sd[f"{p}.bias"] = np.asarray(d["bias"])
        sd[f"{p}.running_mean"] = np.asarray(d["mean"])
        sd[f"{p}.running_var"] = np.asarray(d["var"])

    def put_prelu(p, d):
        sd[f"{p}.weight"] = np.asarray(d["a"])

    def put_linear(p, d):
        sd[f"{p}.weight"] = np.asarray(d["w"]).T
        sd[f"{p}.bias"] = np.asarray(d["b"])

    put_conv("conv1", arc_params["conv1"])
    put_bn("bn1", arc_params["bn1"])
    put_prelu("prelu", arc_params["prelu"])
    for li, blocks in enumerate(arc_params["layers"], start=1):
        for bi, blk in enumerate(blocks):
            pre = f"layer{li}.{bi}"
            put_bn(f"{pre}.bn0", blk["bn0"])
            put_conv(f"{pre}.conv1", blk["conv1"])
            put_bn(f"{pre}.bn1", blk["bn1"])
            put_prelu(f"{pre}.prelu", blk["prelu"])
            put_conv(f"{pre}.conv2", blk["conv2"])
            put_bn(f"{pre}.bn2", blk["bn2"])
            put_linear(f"{pre}.se.fc.0", blk["se"]["fc1"])
            put_prelu(f"{pre}.se.fc.1", blk["se"]["prelu"])
            put_linear(f"{pre}.se.fc.2", blk["se"]["fc2"])
            if "downsample" in blk:
                put_conv(f"{pre}.downsample.0", blk["downsample"]["conv"])
                put_bn(f"{pre}.downsample.1", blk["downsample"]["bn"])
    put_bn("bn4", arc_params["bn4"])
    put_linear("fc5", arc_params["fc5"])
    put_bn("bn5", arc_params["bn5"])

    rec = convert_arcface_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 128, 128))
    np.testing.assert_allclose(
        np.asarray(arcface_embed(arc_params, x)),
        np.asarray(arcface_embed(rec, x)), atol=1e-5)


def test_gradient_mask():
    x = jnp.ones((4, 4))
    mask = jnp.zeros((4, 4)).at[:2].set(1.0)

    def loss(x):
        return (gradient_mask(x, mask) ** 2).sum()

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g[:2]), 2.0)
    np.testing.assert_allclose(np.asarray(g[2:]), 0.0)


def test_bilinear_crop_identity_and_grad():
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64),
                      jnp.float32)
    # full-image crop resized to 64 ≈ identity
    bbox = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    out = bilinear_crop(img, bbox, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)
    # crop of a constant region returns the constant
    img2 = jnp.zeros((1, 3, 64, 64)).at[:, :, 10:30, 10:30].set(5.0)
    out2 = bilinear_crop(img2, jnp.asarray([[12.0, 12.0, 28.0, 28.0]]), 16)
    np.testing.assert_allclose(np.asarray(out2), 5.0, atol=1e-5)
    # gradients flow to the image
    g = jax.grad(lambda im: bilinear_crop(im, bbox, 32).sum())(img)
    assert float(jnp.abs(g).sum()) > 0


def test_arcface_align_loss(arc_params):
    rs = np.random.RandomState(0)
    ref = jnp.asarray(rs.randn(2, 3, 64, 64), jnp.float32) * 0.2
    gen = jnp.asarray(rs.randn(2, 3, 64, 64), jnp.float32) * 0.2
    bbox = jnp.asarray([[8, 8, 56, 56]] * 2, jnp.float32)
    mask = jnp.ones((2,))

    def loss(gen):
        a, fg, bg = calc_arcface_align_loss(
            arc_params, ref, gen, bbox, bbox, mask)
        return a + 0.1 * fg

    val, g = jax.value_and_grad(loss)(gen)
    assert np.isfinite(float(val))
    assert float(jnp.abs(g).sum()) > 0
    # identical images → near-zero align loss
    a, _, _ = calc_arcface_align_loss(arc_params, ref, ref, bbox, bbox, mask)
    assert float(a) < 1e-3


def test_detect_face_bboxes_fallback():
    imgs = np.zeros((2, 3, 64, 64), np.float32)
    bboxes, detected = detect_face_bboxes(imgs)
    assert bboxes.shape == (2, 4)
    # no faces in black images → full-image boxes, detected 0
    assert detected.sum() == 0
    np.testing.assert_allclose(bboxes[0], [0, 0, 64, 64])
