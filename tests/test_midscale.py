"""Mid-scale long-sequence regression (VERDICT r4 item 2).

The 120-150-frame territory between the 16-frame e2e fixtures and the
500-frame ATE harness is where rounds 3 and 4 both broke silently (the
coverage collapse and the NaN-pose poisoning lived exactly there, and
both were only caught by hand-running the harness). This test runs the
FULL windowed pipeline — detection, windowed SfM, stitching, loop
closure, relocalization, switchable-constraint pose graph, global BA —
on the `m00` layout of `tools/ate_benchmark.py`: a 150-frame city-block
loop whose per-frame spacing (~0.7 m) and corner yaw rate (~3 deg/frame)
match the 500-frame s00 workload, so it pins the long-sequence GLUE at
production per-frame difficulty in CPU-tractable time.
"""

import os
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)


@pytest.mark.slow
def test_midscale_city_loop_regression():
    import ate_benchmark as ab

    m = ab.run_sequence("m00", 150, cache_dir="/tmp")
    # the three pinned failure modes:
    # 1. coverage collapse (round 3: 500-frame coverage fell to ~30%)
    assert m["coverage"] > 0.9, m
    # 2. NaN poisoning (round 4: one non-finite anchor pose turned 98.6%
    #    coverage into all-NaN output) — a finite ATE proves no NaN pose
    #    survived into the evaluated trajectory
    assert np.isfinite(m["ate_rms"]), m
    # 3. unremoved drift (round 4: 7.07% of trajectory vs the repo's own
    #    2% north-star bound, tests/test_northstar_e2e.py)
    assert m["ate_pct_traj"] < 2.0, m
    assert np.isfinite(m["rpe_trans"]) and np.isfinite(m["rpe_rot"]), m
