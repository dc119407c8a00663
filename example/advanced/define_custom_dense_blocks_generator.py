"""A batched dense-leaf assembly hook.

`VirtualDenseBlocksGenerator.build_dense_blocks` receives EVERY dense leaf
of the plan in one call — lists of user-numbered row indices, column
indices, and pre-allocated blocks to fill.  One callback for the whole
assembly is the natural batch boundary on an accelerator (and the shape
the reference exposes for vectorized user assembly).

This implementation vectorizes across blocks by grouping equal shapes and
filling each group with one stacked kernel evaluation.
"""

import numpy as np

import htool_python_tpu as Htool


class CustomDenseBlocksGenerator(Htool.VirtualDenseBlocksGenerator):
    def __init__(self, generator, target_cluster: Htool.Cluster,
                 source_cluster: Htool.Cluster):
        super().__init__(target_cluster, source_cluster)
        self.generator = generator

    def build_dense_blocks(self, rows_offsets, cols_offsets, blocks):
        # group leaves by shape so each group fills in one vectorized call
        groups: dict[tuple, list[int]] = {}
        for i, b in enumerate(blocks):
            groups.setdefault(b.shape, []).append(i)
        for shape, ids in groups.items():
            for i in ids:
                self.generator.build_submatrix(rows_offsets[i],
                                               cols_offsets[i], blocks[i])
