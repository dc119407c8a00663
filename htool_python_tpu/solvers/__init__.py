from .krylov import cg, gmres
from .options import parse_hpddm_args
from .ddm import DDMSolver, DDMSolverBuilder, DDMSolverWithDenseLocalSolver
from .coarse import (
    GeneoCoarseOperatorBuilder,
    GeneoCoarseSpaceDenseBuilder,
    VirtualGeneoCoarseSpaceBuilder,
    VirtualGeneoCoarseSpaceDenseBuilder,
)

__all__ = [
    "gmres",
    "cg",
    "parse_hpddm_args",
    "DDMSolver",
    "DDMSolverBuilder",
    "DDMSolverWithDenseLocalSolver",
    "GeneoCoarseSpaceDenseBuilder",
    "VirtualGeneoCoarseSpaceDenseBuilder",
    "VirtualGeneoCoarseSpaceBuilder",
    "GeneoCoarseOperatorBuilder",
]
