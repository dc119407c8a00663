"""Batched dense-leaf assembly hook (reference:
example/advanced/define_custom_dense_blocks_generator.py): ALL dense leaf
blocks are handed over in one callback — the natural TPU batch boundary."""

import htool_python_tpu as Htool


class CustomDenseBlocksGenerator(Htool.VirtualDenseBlocksGenerator):
    def __init__(self, generator, target_cluster: Htool.Cluster,
                 source_cluster: Htool.Cluster):
        super().__init__(target_cluster, source_cluster)
        self.generator = generator

    def build_dense_blocks(self, rows_offsets, cols_offsets, blocks):
        for i in range(len(blocks)):
            self.generator.build_submatrix(rows_offsets[i], cols_offsets[i],
                                           blocks[i])
