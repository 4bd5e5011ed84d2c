from tweediemix_tpu.schedulers.ddim import DDIMTable, rescale_noise_cfg, video_rotation_step

__all__ = ["DDIMTable", "rescale_noise_cfg", "video_rotation_step"]
