"""Execute the driver's multichip dryrun gate inside the test tiers.

Round 4 shipped with MULTICHIP_r04.json rc=1 because the dryrun was not in
any pytest tier (VERDICT r4 weak #5 / task 2c): nothing red appeared locally
while the driver artifact broke. This test runs the EXACT driver entry point
(`__graft_entry__.dryrun_multichip(8)`) on the 8-device virtual CPU mesh the
conftest already forces, so a regression in any of its four stages (block-fit
+ a2a lookup, MIDX refresh, EP-MMoE, chunked streaming + approx-ANN) fails
the fast tier at HEAD.
"""
import os
import sys

import pytest


@pytest.mark.dryrun
def test_driver_dryrun_multichip_8():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    try:
        import __graft_entry__ as graft
        graft.dryrun_multichip(8)  # raises/asserts on any stage failure
    finally:
        sys.path.pop(0)


@pytest.mark.dryrun
def test_driver_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    try:
        import jax

        import __graft_entry__ as graft
        fn, args = graft.entry()
        import numpy as np
        assert np.isfinite(float(jax.jit(fn)(*args)))
    finally:
        sys.path.pop(0)
