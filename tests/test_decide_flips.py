"""Gate-flip decision rules (tools/decide_flips.py): a knob flips only on a
uniform >3% win, the windowed texture kernel additionally needs an exact
texprobe, and missing steps read as NO DATA (budget-truncated sequences must
never produce a flip recommendation)."""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
decide_flips = importlib.import_module("decide_flips")


import pytest

pytestmark = pytest.mark.fast  # inner-loop subset (VERDICT r4 item 8)


def _art(steps, tex=None):
    if tex is not None:
        steps = dict(steps, texprobe={"result": {"max_diff": tex}})
    return {"steps": {k: {"result": v} if not isinstance(v, dict) else v
                      for k, v in steps.items()}}


def _verdict(results, knob):
    return next(d["verdict"] for d in results if d["knob"] == knob)


def test_uniform_win_flips():
    res = decide_flips.decide(_art({
        "bunny": 6.0, "bunny_pair": 5.0,
        "shadows": 6.0, "shadows_pair": 5.5,
        "cubes": 4.0, "cubes_pair": 3.5}))
    assert _verdict(res, "RPT_PAIR=1 (pre-flip)") == "FLIP"


def test_mixed_result_keeps_default():
    res = decide_flips.decide(_art({
        "bunny": 6.0, "bunny_pair": 5.0,
        "shadows": 6.0, "shadows_pair": 6.1,  # loses here
        "cubes": 4.0, "cubes_pair": 3.5}))
    assert _verdict(res, "RPT_PAIR=1 (pre-flip)") == "KEEP"


def test_small_win_is_noise():
    res = decide_flips.decide(_art({"bunny": 6.0, "bunny_sub8": 5.9}))
    # 1.7% < 3% margin
    assert _verdict(res, "RPT_SUB=8 (pre-flip)") == "KEEP"


def test_missing_step_is_no_data():
    res = decide_flips.decide(_art({"bunny": 6.0}))
    assert _verdict(res, "RPT_PAIR=1 (pre-flip)") == "NO DATA"


def test_windowed_needs_exact_texprobe():
    steps = {"arch": 5.0, "arch_windowed": 2.0,
             "cubes": 4.0, "cubes_windowed": 1.5}
    fast = decide_flips.decide(_art(steps, tex=0.5))  # runs but WRONG texels
    assert _verdict(fast, "windowed texture (WINDOWED_PROVEN)").startswith(
        "KEEP")
    exact = decide_flips.decide(_art(steps, tex=1e-7))
    assert _verdict(exact, "windowed texture (WINDOWED_PROVEN)") == "FLIP"


def test_ab_matrix_names_exist_in_sequence():
    """Every step name the CURRENT decision rules reference must be produced
    by a sequence tool, otherwise a recovery run yields NO DATA rows for
    real measurements. The pre-flip generation lives in the frozen
    LEGACY_AB_MATRIX (its names exist only in the landed 2026-08-19
    artifact) and is deliberately exempt -- test truth must not depend on
    regenerable artifact contents (ADVICE r4, medium)."""
    repo = Path(__file__).resolve().parents[1]
    src = "".join(
        (repo / "tools" / t).read_text()
        for t in ("round4_one_claim.py", "round4_followup.py",
                  "round5_claim.py", "round5_followup.py",
                  "round5_levers.py", "round5_post2.py",
                  "round5_texaddr.py", "round5_nb.py")
        if (repo / "tools" / t).exists())
    for pairs in decide_flips.AB_MATRIX.values():
        for base, ab in pairs:
            for name in (base, ab):
                assert f'"{name}"' in src, name


def test_legacy_matrix_is_frozen():
    """The legacy names must never migrate back into AB_MATRIX (they are
    not producible by any current tool)."""
    legacy_steps = {n for pairs in decide_flips.LEGACY_AB_MATRIX.values()
                    for pair in pairs for n in pair if "_" in n}
    current_steps = {n for pairs in decide_flips.AB_MATRIX.values()
                     for pair in pairs for n in pair}
    assert not legacy_steps & current_steps
