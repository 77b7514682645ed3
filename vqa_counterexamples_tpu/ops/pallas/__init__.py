from . import mutan_kernel
