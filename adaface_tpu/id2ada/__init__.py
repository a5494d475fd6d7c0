from adaface_tpu.id2ada.face_id_to_ada_prompt import (
    Arc2FaceID2AdaPrompt,
    ConsistentIDID2AdaPrompt,
    FaceID2AdaPrompt,
    JointFaceID2AdaPrompt,
    create_id2ada_prompt_encoder,
)
from adaface_tpu.id2ada.subj_basis_generator import (
    SubjBasisConfig,
    init_subj_basis_generator,
    subj_basis_forward,
)
