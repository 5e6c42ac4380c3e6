from zig_tfhe_tpu.models import gates
from zig_tfhe_tpu.models import lut
from zig_tfhe_tpu.models import proxy_reenc
from zig_tfhe_tpu.models import circuits
from zig_tfhe_tpu.models import integer
