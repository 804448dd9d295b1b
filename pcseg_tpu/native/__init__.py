from pcseg_tpu.native.build import load_native
