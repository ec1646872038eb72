from .detector import Detections, MonoRUn, init_detector  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .fpn import FPNplus  # noqa: F401
