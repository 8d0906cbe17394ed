from ogl_tpu.dist import partition as partition
from ogl_tpu.dist.partition import (
    CooStack as CooStack,
    DiaStack as DiaStack,
    DistMatrix as DistMatrix,
    EllStack as EllStack,
    HaloPlan as HaloPlan,
    shard_local_matrix as shard_local_matrix,
)
from ogl_tpu.dist.solve import (
    dist_solve as dist_solve,
    dist_ops as dist_ops,
    schwarz_jacobi_builder as schwarz_jacobi_builder,
    schwarz_block_jacobi_builder as schwarz_block_jacobi_builder,
)
from ogl_tpu.dist.from_ranks import (
    DistAssembler as DistAssembler,
    dist_from_ldu_ranks as dist_from_ldu_ranks,
)
from ogl_tpu.dist.precond import build_schwarz as build_schwarz
from ogl_tpu.dist.global_index import GlobalIndex as GlobalIndex
from ogl_tpu.dist import runtime as runtime
