from adaface_tpu.evaluation.eval_utils import (
    compare_face_folders,
    compare_folders,
    format_prompt_list,
    parse_range_str,
)
