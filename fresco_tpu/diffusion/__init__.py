from fresco_tpu.diffusion.scheduler import DDPMScheduler
