"""MMDuet-TPU: a TPU-native streaming VideoLLM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MMDuet
(the video-text *duet* interaction format for streaming VideoLLMs,
reference: yellow-binary-tree/MMDuet): video frames stream into the
model as a third conversation role, and two lightweight score heads
(informative / relevance) riding the LM's last hidden state decide,
frame by frame, when the assistant should speak.

Subpackages
-----------
- ``mmduet_tpu.stream``   — chat template, char-offset learn ranges, labels
- ``mmduet_tpu.models``   — Qwen2 decoder, SigLIP tower, projector, score heads (pure JAX)
- ``mmduet_tpu.ops``      — Pallas TPU kernels (fused attention, pooling)
- ``mmduet_tpu.parallel`` — device mesh, sharding rules, collectives layout
- ``mmduet_tpu.infer``    — streaming inference engine with a static-shape KV cache
- ``mmduet_tpu.data``     — video datasets, collator, host-side decode
- ``mmduet_tpu.train``    — LoRA fine-tuning loop (pjit, sharded optimizer, orbax)
- ``mmduet_tpu.eval``     — benchmark harness + metric stack (DVC/QVH/grounding/MAGQA)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MMDUET_PLATFORM"):
    # Escape hatch for rigs whose sitecustomize force-registers an
    # accelerator backend at interpreter start (where JAX_PLATFORMS in
    # the environment is overridden before user code runs): setting
    # MMDUET_PLATFORM=cpu forces every CLI/import of this package onto
    # the named platform — e.g. to run the demo or eval CLIs while the
    # accelerator tunnel is down, or to smoke-test off-device.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MMDUET_PLATFORM"])
