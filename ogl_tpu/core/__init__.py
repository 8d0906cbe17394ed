from ogl_tpu.core import formats as formats
from ogl_tpu.core import ldu as ldu
from ogl_tpu.core import mtx as mtx
