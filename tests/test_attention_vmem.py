"""Block clamping keeps the standard-layout flash kernel within VMEM."""

from adaface_tpu.ops.attention import _clamp_blocks_to_vmem


def _footprint(bq, bk, dp, b):
    return 2 * (bq * dp + 2 * bk * dp + bq * dp) * b + bq * bk * 4 + bq * dp * 4


def test_clamp_noop_for_small_heads():
    # SD1.5 transposed-path shapes are untouched at the default budget
    assert _clamp_blocks_to_vmem(1024, 2048, 128, 2) == (1024, 2048)


def test_clamp_shrinks_for_vae_head():
    # D=512 single-head VAE attention: 1024/2048 would need ~24 MB
    bq, bk = _clamp_blocks_to_vmem(1024, 2048, 512, 2)
    assert _footprint(bq, bk, 512, 2) <= 12 * 1024 * 1024
    assert bq >= 128 and bk >= 128


def test_clamp_terminates_at_floor():
    bq, bk = _clamp_blocks_to_vmem(128, 128, 8192, 4)
    assert (bq, bk) == (128, 128)
