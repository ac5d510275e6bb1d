from .build import make_data_loader
from .collate import BatchCollator
from .transforms import build_transforms

__all__ = ["make_data_loader", "BatchCollator", "build_transforms"]
