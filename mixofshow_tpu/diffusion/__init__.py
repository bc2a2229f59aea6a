from mixofshow_tpu.diffusion.ddpm import DDPMSchedule, make_ddpm_schedule
from mixofshow_tpu.diffusion.dpm_solver import DPMSolverMultistep

__all__ = ['DDPMSchedule', 'make_ddpm_schedule', 'DPMSolverMultistep']
