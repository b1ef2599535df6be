"""torchmetrics stub for running the torch reference (/root/reference).

The reference imports `torchmetrics.functional as M` (reference
eval/__init__.py:6) and uses only the binary-task functional metrics;
`functional.py` implements exactly that surface in plain torch/numpy.
"""
from . import functional  # noqa: F401
