from zig_tfhe_tpu.utils import torus
from zig_tfhe_tpu.utils import rng
