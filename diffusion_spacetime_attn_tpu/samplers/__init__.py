from .ddim import ddim_sample
from .ddpm import ddpm_sample
from .plms import plms_sample
from .dpm_solver import dpm_solver_sample
from .remat import maybe_remat

__all__ = ["ddim_sample", "ddpm_sample", "plms_sample", "dpm_solver_sample", "maybe_remat"]
