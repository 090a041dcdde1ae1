"""diffusion_spacetime_attn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of UCSB-NLP-Chang/Diffusion-SpaceTime-Attn.

Subpackages:
  models/    SD v1 UNet, AutoencoderKL, CLIP towers, layout predictor
  ops/       schedules, region masks, blended spacetime attention, Pallas kernels
  samplers/  PLMS / DDIM / DPM-Solver++ as lax.scan
  pipeline/  txt2img, spatial control, temporal weight optimization, runners
  parallel/  device meshes and shardings (pjit/shard_map)
  training/  layout-predictor + LDM (UNet) training (losses, schedules,
             checkpointing, resume)
  serving/   dynamic-batching txt2img engine + HTTP front
  eval/      CLIP-score fidelity, object recall / relation accuracy protocol
  utils/     tokenizers, image io, weight converters, logging, profiling
"""

__version__ = "0.1.0"

# Public API (lazy — importing the package must not pull in jax-heavy deps)
__all__ = [
    "PipelineConfig",
    "SpaceTimeConfig",
    "StableDiffusion",
    "SpatialControl",
    "SpaceTimeInputs",
    "optimize_prompt",
    "LayoutInference",
    "PromptRunner",
    "LDMTrainer",
    "LayoutTrainer",
    "TextToImageEngine",
    "BatchingService",
    "Retriever",
    "RetrievalAugmentedDiffusion",
]


def __getattr__(name):
    if name in ("PipelineConfig", "SpaceTimeConfig"):
        from . import config

        return getattr(config, name)
    if name == "StableDiffusion":
        from .pipeline.pipeline import StableDiffusion

        return StableDiffusion
    if name == "SpatialControl":
        from .ops.attention import SpatialControl

        return SpatialControl
    if name in ("SpaceTimeInputs", "optimize_prompt"):
        from .pipeline import spacetime

        return getattr(spacetime, name)
    if name == "LayoutInference":
        from .pipeline.frontend import LayoutInference

        return LayoutInference
    if name == "PromptRunner":
        from .pipeline.runners import PromptRunner

        return PromptRunner
    if name == "LDMTrainer":
        from .training.ldm_trainer import LDMTrainer

        return LDMTrainer
    if name == "LayoutTrainer":
        from .training.layout_trainer import LayoutTrainer

        return LayoutTrainer
    if name in ("TextToImageEngine", "BatchingService"):
        from . import serving

        return getattr(serving, name)
    if name == "Retriever":
        from .pipeline.retrieval import Retriever

        return Retriever
    if name == "RetrievalAugmentedDiffusion":
        from .pipeline.knn2img import RetrievalAugmentedDiffusion

        return RetrievalAugmentedDiffusion
    raise AttributeError(name)
