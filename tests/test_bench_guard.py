"""Official-run backend guard: the axon plugin can fail sideways (error out
instead of blocking), letting jax fall back to the CPU backend. bench.py and
tools/round4_one_claim.py must refuse to record CPU frames as an official TPU
artifact; explicit RPT_PLATFORM pins (the smoke path) stay exempt."""

import bench


import pytest

pytestmark = pytest.mark.fast  # inner-loop subset (VERDICT r4 item 8)


def test_cpu_fallback_policy():
    # official run on cpu -> refuse
    assert bench.cpu_fallback("cpu", None)
    # set-but-empty pin (RPT_PLATFORM="" via an unset wrapper var) does NOT
    # pin the platform, so it must not exempt the guard either
    assert bench.cpu_fallback("cpu", "")
    # explicit smoke pin -> allowed
    assert not bench.cpu_fallback("cpu", "cpu")
    # real chip, any plugin platform name -> allowed
    assert not bench.cpu_fallback("tpu", None)
    assert not bench.cpu_fallback("axon", None)
