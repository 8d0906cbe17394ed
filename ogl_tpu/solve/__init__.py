from ogl_tpu.solve import stopping as stopping
from ogl_tpu.solve import krylov as krylov
from ogl_tpu.solve.cg import cg as cg
from ogl_tpu.solve.bicgstab import bicgstab as bicgstab
from ogl_tpu.solve.gmres import gmres as gmres
from ogl_tpu.solve.ir import ir as ir
