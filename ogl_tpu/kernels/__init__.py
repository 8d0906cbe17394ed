from ogl_tpu.kernels import spmv as spmv
from ogl_tpu.kernels import roofline as roofline
