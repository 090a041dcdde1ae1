"""diffusion_spacetime_attn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of UCSB-NLP-Chang/Diffusion-SpaceTime-Attn.

Subpackages:
  models/    SD v1 UNet, AutoencoderKL, CLIP towers, layout predictor
  ops/       schedules, region masks, blended spacetime attention, Pallas kernels
  samplers/  PLMS / DDIM / DPM-Solver++ as lax.scan
  pipeline/  txt2img, spatial control, temporal weight optimization, runners
  parallel/  device meshes and shardings (pjit/shard_map)
  training/  layout-predictor training (losses, schedules, checkpointing)
  eval/      CLIP-score fidelity, object recall / relation accuracy protocol
  utils/     tokenizers, image io, weight converters, logging, profiling
"""

__version__ = "0.1.0"
