from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig

__all__ = ["UNet2DConditionModel", "UNetConfig"]
