from .local_operator import (
    LocalDenseMatrix,
    LocalHMatrix,
    LocalRenumbering,
    RestrictedGlobalToLocalOperator,
    VirtualLocalToLocalOperator,
)
from .distributed_operator import DistributedOperator
from .builders import (
    CustomApproximationBuilder,
    DefaultApproximationBuilder,
    DefaultLocalApproximationBuilder,
    PerPartition,
)

__all__ = [
    "LocalRenumbering",
    "RestrictedGlobalToLocalOperator",
    "VirtualLocalToLocalOperator",
    "LocalHMatrix",
    "LocalDenseMatrix",
    "DistributedOperator",
    "DefaultApproximationBuilder",
    "DefaultLocalApproximationBuilder",
    "CustomApproximationBuilder",
    "PerPartition",
]
