"""htool_python_tpu — a TPU-native hierarchical-matrix / DDM framework.

A from-scratch rebuild of the capabilities of htool-ddm/htool_python
(reference: /root/reference, pybind11 bindings over the Htool C++ core)
designed for TPU hardware: cluster trees and block plans are computed on
host (numpy / native C++), all compute-heavy paths (assembly, compression,
matvec/matmat, Krylov solvers, DDM preconditioners) are batched JAX/XLA
programs over padded, bucketed block arrays, and distribution is expressed
with `jax.sharding.Mesh` + `shard_map` collectives instead of MPI.

The public surface intentionally mirrors the reference module `Htool`
(see reference src/htool/main.cpp:40-112) so that users of the reference
find every class/function under the same name; `Complex*` aliases are the
same classes (dtype is inferred from the data in this framework).
"""

from .config import Config, get_config, set_precision, use_x64

# Clustering (reference: src/htool/clustering/*)
from .clustering.cluster import Cluster, ClusterTreeBuilder
from .clustering.partitioning import (
    BoundingBoxGeometric,
    BoundingBoxRegular,
    PCAGeometric,
    PCARegular,
    VirtualPartitioning,
)
from .clustering.io import read_cluster_from, write_cluster_to

# H-matrix (reference: src/htool/hmatrix/*)
from .hmatrix.generator import (
    VirtualGenerator,
    VirtualLowRankGenerator,
    VirtualDenseBlocksGenerator,
    FunctionGenerator,
    MatrixGenerator,
    KernelGenerator,
)
from .hmatrix.lowrank import LowRankMatrix
from .hmatrix.hmatrix import HMatrix, HMatrixTreeBuilder
from .hmatrix.recompression import recompression, openmp_recompression

# Local operators (reference: src/htool/local_operator/*)
from .parallel.local_operator import (
    LocalRenumbering,
    RestrictedGlobalToLocalOperator,
    VirtualLocalToLocalOperator,
    LocalHMatrix,
    LocalDenseMatrix,
)

# Distributed operator (reference: src/htool/distributed_operator/*)
from .parallel.distributed_operator import DistributedOperator
from .parallel.builders import (
    CustomApproximationBuilder,
    DefaultApproximationBuilder,
    DefaultLocalApproximationBuilder,
)

# Solvers (reference: src/htool/solver/*)
from .solvers.ddm import DDMSolver, DDMSolverBuilder, DDMSolverWithDenseLocalSolver
from .solvers.coarse import (
    GeneoCoarseOperatorBuilder,
    GeneoCoarseSpaceDenseBuilder,
    VirtualGeneoCoarseSpaceBuilder,
    VirtualGeneoCoarseSpaceDenseBuilder,
)

# Misc (reference: src/htool/misc/*, src/htool/matplotlib/*)
from .utils.logger import logger, test_logger
from .utils.plotting import plot

# "Complex*" aliases: in the reference every class is instantiated twice
# (double / complex double, main.cpp:89-111).  Here dtype is a property of
# the data, so the complex names alias the same classes for API parity.
ComplexVirtualGenerator = VirtualGenerator
ComplexVirtualLowRankGenerator = VirtualLowRankGenerator
ComplexVirtualDenseBlocksGenerator = VirtualDenseBlocksGenerator
ComplexLowRankMatrix = LowRankMatrix
ComplexHMatrix = HMatrix
ComplexHMatrixTreeBuilder = HMatrixTreeBuilder
ComplexVirtualPartitioning = VirtualPartitioning
ComplexRestrictedGlobalToLocalOperator = RestrictedGlobalToLocalOperator
ComplexVirtualLocalToLocalOperator = VirtualLocalToLocalOperator
ComplexDistributedOperator = DistributedOperator
ComplexDefaultApproximationBuilder = DefaultApproximationBuilder
ComplexDefaultLocalApproximationBuilder = DefaultLocalApproximationBuilder
ComplexCustomApproximationBuilder = CustomApproximationBuilder
ComplexDDMSolverBuilder = DDMSolverBuilder
ComplexDDMSolverWithDenseLocalSolver = DDMSolverWithDenseLocalSolver
ComplexGeneoCoarseSpaceDenseBuilder = GeneoCoarseSpaceDenseBuilder
ComplexVirtualGeneoCoarseSpaceDenseBuilder = VirtualGeneoCoarseSpaceDenseBuilder
ComplexVirtualGeneoCoarseSpaceBuilder = VirtualGeneoCoarseSpaceBuilder
ComplexGeneoCoarseOperatorBuilder = GeneoCoarseOperatorBuilder

# reference name: `Solver` is the DDM solver class (main.cpp / solver.hpp:16)
Solver = DDMSolver
ComplexSolver = DDMSolver

__all__ = [n for n in dir() if not n.startswith("_")]

__version__ = "0.1.0"
