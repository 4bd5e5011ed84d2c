"""Native (C++) host kernels, built lazily with g++ and bound via ctypes."""

from tweediemix_tpu.native.build import get_augment_lib  # noqa: F401
