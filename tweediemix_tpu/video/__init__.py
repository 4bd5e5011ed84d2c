from tweediemix_tpu.video.pipeline import I2VPipeline, VideoConfig

__all__ = ["I2VPipeline", "VideoConfig"]
