import jax
import numpy as np

from adaface_tpu.models.retinaface import (
    RetinaFaceClient,
    decode_boxes,
    init_retinaface_params,
    nms,
    prior_boxes,
    retinaface_forward,
)


def test_forward_shapes_and_anchor_count():
    p = init_retinaface_params(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 128, 128)) * 50
    loc, conf, landms = retinaface_forward(p, x)
    priors = prior_boxes((128, 128))
    # anchors: 2 per location over strides 8/16/32
    expect = 2 * (16 * 16 + 8 * 8 + 4 * 4)
    assert priors.shape == (expect, 4)
    assert loc.shape == (1, expect, 4)
    assert conf.shape == (1, expect, 2)
    assert landms.shape == (1, expect, 10)
    np.testing.assert_allclose(np.asarray(conf.sum(-1)), 1.0, atol=1e-5)


def test_decode_identity():
    priors = prior_boxes((64, 64))
    boxes = decode_boxes(np.zeros((len(priors), 4), np.float32), priors)
    # zero deltas → boxes centered on priors with prior sizes
    np.testing.assert_allclose(boxes[:, 2] - boxes[:, 0], priors[:, 2],
                               atol=1e-6)
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    np.testing.assert_allclose(centers, priors[:, :2], atol=1e-6)


def test_nms():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, thres=0.4)
    assert keep == [0, 2]  # the overlapping second box is suppressed


def test_client_protocol():
    client = RetinaFaceClient(rng=jax.random.PRNGKey(0))
    img = np.random.RandomState(0).randint(0, 255, (96, 96, 3), np.uint8)
    faces = client.detect_faces(img, conf_thres=0.99)
    assert isinstance(faces, list)  # random weights: usually empty
    images = np.random.RandomState(1).randn(2, 3, 96, 96).astype(np.float32)
    bboxes, confs, detected = client.crop_faces(images)
    assert bboxes.shape == (2, 4) and detected.shape == (2,)
    # undetected → full-image boxes
    for i in range(2):
        if detected[i] == 0:
            np.testing.assert_allclose(bboxes[i], [0, 0, 96, 96])


def test_converter_roundtrip():
    from adaface_tpu.models.retinaface import convert_retinaface_state_dict

    p = init_retinaface_params(jax.random.PRNGKey(0))
    sd = {}

    def put_conv(pre, d):
        w = np.asarray(d["w"])  # HWIO → torch [O, I, kh, kw]
        sd[f"{pre}.weight"] = w.transpose(3, 2, 0, 1).copy()

    def put_bn(pre, d):
        sd[f"{pre}.weight"] = np.asarray(d["scale"])
        sd[f"{pre}.bias"] = np.asarray(d["bias"])
        sd[f"{pre}.running_mean"] = np.asarray(d["mean"])
        sd[f"{pre}.running_var"] = np.asarray(d["var"])

    def put_cb(pre, d):
        put_conv(f"{pre}.0", d["conv"])
        put_bn(f"{pre}.1", d["bn"])

    def put_dw(pre, d):
        put_conv(f"{pre}.0", d["dw"]["conv"])
        put_bn(f"{pre}.1", d["dw"]["bn"])
        put_conv(f"{pre}.3", d["pw"]["conv"])
        put_bn(f"{pre}.4", d["pw"]["bn"])

    put_cb("body.stage1.0", p["body"]["stage1"]["0"])
    for i in range(1, 6):
        put_dw(f"body.stage1.{i}", p["body"]["stage1"][str(i)])
    for i in range(6):
        put_dw(f"body.stage2.{i}", p["body"]["stage2"][str(i)])
    for i in range(2):
        put_dw(f"body.stage3.{i}", p["body"]["stage3"][str(i)])
    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        put_cb(f"fpn.{name}", p["fpn"][name])
    for i, s in enumerate(p["ssh"], start=1):
        put_cb(f"ssh{i}.conv3X3", s["conv3x3"])
        put_cb(f"ssh{i}.conv5X5_1", s["conv5x5_1"])
        put_cb(f"ssh{i}.conv5X5_2", s["conv5x5_2"])
        put_cb(f"ssh{i}.conv7X7_2", s["conv7x7_2"])
        put_cb(f"ssh{i}.conv7x7_3", s["conv7x7_3"])
    for name, tname in (("class", "ClassHead"), ("bbox", "BboxHead"),
                        ("landmark", "LandmarkHead")):
        for i, hp in enumerate(p["heads"][name]):
            put_conv(f"{tname}.{i}.conv1x1", hp["conv"])
            sd[f"{tname}.{i}.conv1x1.bias"] = np.asarray(hp["b"])

    rec = convert_retinaface_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 64, 64)) * 10
    l1, c1, m1 = retinaface_forward(p, x)
    l2, c2, m2 = retinaface_forward(rec, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
