from zig_tfhe_tpu.parallel import mesh
