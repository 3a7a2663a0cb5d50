from .dataset import DatasetConfig

__all__ = ["DatasetConfig"]
