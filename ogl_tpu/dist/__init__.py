from ogl_tpu.dist import partition as partition
from ogl_tpu.dist.partition import DistMatrix as DistMatrix, HaloPlan as HaloPlan
from ogl_tpu.dist.solve import dist_solve as dist_solve, dist_ops as dist_ops
from ogl_tpu.dist.from_ranks import dist_from_ldu_ranks as dist_from_ldu_ranks
from ogl_tpu.dist.global_index import GlobalIndex as GlobalIndex
