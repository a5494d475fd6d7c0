import numpy as np
import pytest

from adaface_tpu.native import load_imgops, prepare_item_native


@pytest.fixture(scope="module")
def lib():
    lib = load_imgops()
    if lib is None:
        pytest.skip("native imgops unavailable (no g++?)")
    return lib


def test_native_builds_and_loads(lib):
    assert lib is not None


def test_prepare_item_matches_numpy_reference(lib):
    from adaface_tpu.data.personalized import PersonalizedBase

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (100, 100, 3), np.uint8)
    fg = (rs.rand(100, 100) > 0.5).astype(np.float32)

    # build a dataset shell to reuse the numpy reference path
    ds = PersonalizedBase.__new__(PersonalizedBase)
    ds.size = 64
    s = 64
    from PIL import Image

    img64 = np.asarray(Image.fromarray(img).resize((s, s), Image.NEAREST))
    fg64 = np.asarray(
        Image.fromarray((fg * 255).astype(np.uint8)).resize((s, s),
                                                            Image.NEAREST))
    fg64 = (fg64 > 127).astype(np.float32)

    for do_flip, scale, dy, dx in [(False, 1.0, 0, 0), (True, 1.0, 0, 0),
                                   (False, 0.5, 0, 0), (True, 0.75, 5, -3)]:
        native = prepare_item_native(
            img64, (fg64 * 255).astype(np.uint8), s, do_flip, scale, dy, dx)
        assert native is not None
        n_img, n_fg, n_aug = native
        r_img, r_fg, r_aug = ds._augment_numpy(
            img64.copy(), fg64.copy(), do_flip, scale, dy, dx)
        np.testing.assert_allclose(n_aug, r_aug, atol=1e-6,
                                   err_msg=f"aug {do_flip},{scale},{dy},{dx}")
        np.testing.assert_allclose(n_fg, r_fg, atol=1e-6,
                                   err_msg=f"fg {do_flip},{scale},{dy},{dx}")
        np.testing.assert_allclose(n_img, r_img, atol=1e-2,
                                   err_msg=f"img {do_flip},{scale},{dy},{dx}")


def test_native_speedup(lib):
    import time

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (512, 512, 3), np.uint8)
    fg = (rs.rand(512, 512) * 255).astype(np.uint8)

    t0 = time.perf_counter()
    for _ in range(20):
        prepare_item_native(img, fg, 512, True, 0.7, 17, -9)
    native_dt = (time.perf_counter() - t0) / 20

    from adaface_tpu.data.personalized import PersonalizedBase

    ds = PersonalizedBase.__new__(PersonalizedBase)
    ds.size = 512
    fg_f = (fg > 127).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(20):
        ds._augment_numpy(img.copy(), fg_f.copy(), True, 0.7, 17, -9)
    numpy_dt = (time.perf_counter() - t0) / 20
    print(f"native {native_dt * 1e3:.2f}ms vs numpy {numpy_dt * 1e3:.2f}ms")
    assert native_dt < numpy_dt  # the point of the native path
