"""revisionllm_tpu: TPU-native recursive video temporal grounding.

Public API surface (see README.md):
- config: WorkloadConfig presets (get_preset)
- inference.inference: single-call grounding/chat API
- eval.engine.GroundingEngine: batched stage-1/stage-2 inference
- eval.stage1 / eval.stage2 / eval.fusion: CLI drivers
- train.train_cli: training entry
- models.convert.load_pretrained: reference-checkpoint assembly
"""

__version__ = "0.1.0"

from revisionllm_tpu.config import (  # noqa: F401
    AdapterConfig,
    DataConfig,
    EvalConfig,
    LlamaConfig,
    LoraConfig,
    MeshConfig,
    TrainConfig,
    WorkloadConfig,
    get_preset,
)
