from .checkpoint import CheckpointStore, FragmentRecord

__all__ = ["CheckpointStore", "FragmentRecord"]
