from .inference import inference_detector, init_inference  # noqa: F401
from .test import run_eval  # noqa: F401
