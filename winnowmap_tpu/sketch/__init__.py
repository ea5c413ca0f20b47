"""Device weighted-minimizer sketch (see sketch/device.py)."""
from .device import sketch_device  # noqa: F401
