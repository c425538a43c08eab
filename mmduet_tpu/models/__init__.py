from .qwen2 import (
    KVCache,
    init_kv_cache,
    init_qwen2_params,
    qwen2_forward,
    embed_tokens,
    lm_logits,
)
from .siglip import init_siglip_params, siglip_encode, normalize_pixels
from .mmduet import (
    init_mmduet_params,
    visual_embed,
    joint_embed,
    train_forward,
    step_forward,
    spatial_pool,
    project,
    masked_ce,
    TrainOutput,
    StepOutput,
)
