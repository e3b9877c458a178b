from pcx.parallel import mesh, fft
from pcx.parallel.mesh import make_mesh
from pcx.parallel.fft import pencil_fftn, pencil_ifftn
