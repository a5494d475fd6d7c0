from adaface_tpu.utils.tensor import (
    gen_gradient_scaler,
    gradient_scale,
    ortho_subtract,
    perturb_tensor,
)
