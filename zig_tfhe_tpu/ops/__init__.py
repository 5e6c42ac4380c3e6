from zig_tfhe_tpu.ops import poly
from zig_tfhe_tpu.ops import decomposition
from zig_tfhe_tpu.ops import blind_rotate
from zig_tfhe_tpu.ops import keyswitch
