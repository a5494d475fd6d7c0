from adaface_tpu.core.params import (
    DTypePolicy,
    count_params,
    default_policy,
    he_normal,
    lecun_normal,
    normal_init,
    param_dtype_cast,
    tree_size_bytes,
    zeros_init,
)
