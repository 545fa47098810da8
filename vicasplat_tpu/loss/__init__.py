from .losses import (  # noqa: F401
    LossCameraConfig,
    LossDepthConfig,
    LossLpipsConfig,
    LossMseConfig,
    camera_loss,
    depth_smoothness_loss,
    mse_loss,
    total_loss,
)
from .ssim import ssim, ssim_components  # noqa: F401
