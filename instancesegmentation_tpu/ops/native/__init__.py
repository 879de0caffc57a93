"""Native (C++) host kernels with build-on-first-import + ctypes bindings."""

from instancesegmentation_tpu.ops.native.build import load_native
