from .assigner import assign_max_iou  # noqa: F401
from .sampler import sample_rois  # noqa: F401
