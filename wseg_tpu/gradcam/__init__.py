from wseg_tpu.gradcam.cam_methods import (  # noqa: F401
    CAM_METHODS,
    AblationCAM,
    BaseCAM,
    EigenCAM,
    EigenGradCAM,
    GradCAM,
    GradCAMPlusPlus,
    LayerCAM,
    ScoreCAM,
    XGradCAM,
    get_cam_method,
)
