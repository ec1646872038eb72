from .kitti import KITTI3DDataset  # noqa: F401
