from zig_tfhe_tpu.parallel import mesh
from zig_tfhe_tpu.parallel import distributed
