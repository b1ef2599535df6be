"""nni stub for running the torch reference (/root/reference) in this image.

The reference imports nni unconditionally (reference utils/utils.py:8) but
golden-parity runs never use tune mode; these no-ops are the entire surface
it touches.
"""


def get_next_parameter():
    return {}


def report_intermediate_result(*args, **kwargs):
    pass


def report_final_result(*args, **kwargs):
    pass
