"""Distributed-operator tests (parity with reference
tests/test_distributed_operator.py, `mpirun -np {1..4}` replaced by the
n_partitions parameter in a single SPMD process)."""

import numpy as np
import pytest

import htool_python_tpu as H


@pytest.mark.parametrize("epsilon", [1e-3, 1e-6])
@pytest.mark.parametrize("eta", [10])
@pytest.mark.parametrize("dimension", [2, 3])
@pytest.mark.parametrize("nb_rhs", [1, 5])
@pytest.mark.parametrize("n_partitions", [1, 3])
@pytest.mark.parametrize(
    "nb_rows,nb_cols,symmetry,UPLO,use_default_build,low_rank_approximation,"
    "dense_blocks_generator,local_operator,partition_type,number_of_children",
    [
        (400, 400, "S", "L", True, False, False, "None", "None", 2),
        (400, 400, "S", "U", True, False, False, "None", "None", 2),
        (400, 400, "N", "N", True, False, False, "None", "None", 2),
        (400, 200, "N", "N", True, False, False, "None", "None", 2),
        (400, 400, "S", "L", False, True, True, "None", "None", 2),
        (400, 400, "S", "U", False, True, True, "None", "None", 2),
        (400, 400, "N", "N", False, True, True, "None", "None", 2),
        (400, 200, "N", "N", False, True, True, "None", "None", 2),
        (400, 400, "S", "L", False, False, False, "ExtraDiagonal", "None", 2),
        (400, 400, "S", "U", False, False, False, "ExtraDiagonal", "None", 2),
        (400, 400, "N", "N", False, False, False, "ExtraDiagonal", "None", 2),
        (400, 200, "N", "N", False, False, False, "ExtraDiagonal", "None", 2),
        (400, 400, "S", "L", False, False, False, "LocalAndExtraDiagonal",
         "None", 2),
        (400, 400, "S", "U", False, False, False, "LocalAndExtraDiagonal",
         "None", 2),
        (400, 400, "N", "N", False, False, False, "LocalAndExtraDiagonal",
         "None", 2),
        (400, 200, "N", "N", False, False, False, "LocalAndExtraDiagonal",
         "None", 2),
        (400, 200, "N", "N", True, False, False, "None", "Local", 2),
    ],
    indirect=["low_rank_approximation", "dense_blocks_generator",
              "local_operator"],
)
def test_distributed_operator(nb_cols, nb_rhs, epsilon, generator,
                              use_default_build, n_partitions,
                              default_distributed_operator,
                              custom_distributed_operator):
    if use_default_build:
        target_cluster, source_cluster, holder = default_distributed_operator
        distributed_operator = holder.distributed_operator
        local_hmatrices = holder.hmatrix
        global_target_size = sum(h.shape[0] for h in local_hmatrices)
        assert distributed_operator.shape == (global_target_size,
                                              local_hmatrices[0].shape[1])
        print(local_hmatrices[0].get_distributed_information())
        print(local_hmatrices[0].get_local_information())
        print(local_hmatrices[0].get_tree_parameters())
        # reduced stats across every partition's block row (the SPMD analog
        # of the reference's MPI-reduced get_distributed_information,
        # src/htool/hmatrix/hmatrix.hpp:52-54)
        info = distributed_operator.get_distributed_information()
        assert int(info["Number_of_rows"]) == global_target_size
        assert int(info["Number_of_columns"]) == local_hmatrices[0].shape[1]
        assert info["Number_of_partitions"] == str(n_partitions)
        locals_ = [h.get_local_information() for h in local_hmatrices]
        assert int(info["Number_of_low_rank_blocks"]) == sum(
            int(li["Number_of_low_rank_blocks"]) for li in locals_)
        assert int(info["Max_rank"]) == max(
            int(li["Max_rank"]) for li in locals_)
        assert int(info["Storage_size_in_bytes"]) == sum(
            int(li["Storage_size_in_bytes"]) for li in locals_)
    else:
        target_cluster, source_cluster, holder = custom_distributed_operator
        distributed_operator = holder.distributed_operator

    # matrix-vector product vs brute force
    np.random.seed(0)
    x = np.random.rand(nb_cols)
    y_1 = distributed_operator * x
    y_2 = generator.mat_vec(x)
    assert np.linalg.norm(y_1 - y_2) / np.linalg.norm(y_2) < epsilon

    # matrix-matrix product
    X = np.asfortranarray(np.random.rand(nb_cols, nb_rhs))
    Y_1 = distributed_operator @ X
    Y_2 = generator.mat_mat(X)
    assert np.linalg.norm(Y_1 - Y_2) / np.linalg.norm(Y_2) < epsilon

    X = np.asfortranarray(np.random.rand(nb_cols, 1))
    Y_1 = distributed_operator @ X
    Y_2 = generator.mat_mat(X)
    assert np.linalg.norm(Y_1 - Y_2) / np.linalg.norm(Y_2) < epsilon

    # windowed sub-product (reference: test_distributed_operator.py:105-129)
    test_offset = nb_cols // 10
    test_size = nb_cols // 10
    x[:test_offset] = 0
    x[test_offset + test_size:] = 0
    x_perm = np.zeros(nb_cols)
    source_permutation = source_cluster.get_permutation()
    x_perm[source_permutation] = x
    y_2_perm = generator.mat_vec(x_perm)
    target_permutation = target_cluster.get_permutation()
    y_2 = y_2_perm[target_permutation]
    for p in range(n_partitions):
        y_1 = distributed_operator.internal_sub_vector_product_global_to_local(
            x[test_offset:test_offset + test_size], test_offset, partition=p)
        local_cluster = target_cluster.get_cluster_on_partition(p)
        off, sz = local_cluster.get_offset(), local_cluster.get_size()
        assert (np.linalg.norm(y_1 - y_2[off:off + sz])
                / np.linalg.norm(y_2) < (1 + 10) * epsilon)


@pytest.mark.parametrize("epsilon", [1e-3])
@pytest.mark.parametrize("eta", [10])
@pytest.mark.parametrize("dimension", [2])
@pytest.mark.parametrize("n_partitions", [2, 4])
@pytest.mark.parametrize(
    "nb_rows,nb_cols,symmetry,UPLO,partition_type,number_of_children",
    [(400, 400, "S", "L", "None", 2), (400, 200, "N", "N", "Local", 2)],
)
def test_distributed_operator_2d_partitions(nb_cols, epsilon, generator,
                                            n_partitions,
                                            default_distributed_operator):
    _, _, holder = default_distributed_operator
    distributed_operator = holder.distributed_operator
    np.random.seed(0)
    x = np.random.rand(nb_cols)
    y_1 = distributed_operator * x
    y_2 = generator.mat_vec(x)
    assert np.linalg.norm(y_1 - y_2) / np.linalg.norm(y_2) < epsilon
