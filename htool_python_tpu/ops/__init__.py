from . import aca, matvec

__all__ = ["matvec", "aca"]
