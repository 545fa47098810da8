from .metrics import (  # noqa: F401
    compute_psnr,
    compute_ssim,
    camera_eval_metrics,
    pose_auc,
    umeyama_alignment,
)
