"""Turn ROUND4_ONECLAIM.json A/B results into gate-flip recommendations.

The round's perf knobs (RPT_PAIR / RPT_SHADOW_CULL / RPT_ORDER2 / RPT_ABOUND
/ RPT_SUB / the windowed-texture WINDOWED_PROVEN gate) default OFF until
measured on a real chip (CLAUDE.md convention). Once the one-claim sequence
lands, this prints, per knob, the measured default-vs-knob frametimes and a
KEEP/FLIP verdict, so acting on a recovery window is mechanical and the
decision rules are recorded instead of re-derived.

Rules:
- A knob flips only if it wins by > MARGIN on EVERY scene it was measured
  on (relay timings are noisy; a mixed result keeps the default).
- The windowed texture kernel additionally requires texprobe to have run
  wedge-free AND exact (max_diff < 1e-5) -- speed alone never flips it
  (it is the round-3 relay-wedge suspect).

Usage: python tools/decide_flips.py [ROUND4_ONECLAIM.json]
Exit code 0 always (decision support, not a gate).
"""

from __future__ import annotations

import json
import pathlib
import sys

MARGIN = 0.03  # fractional win required to flip (3%; relay noise floor)

# knob -> list of (baseline_step, knob_step) pairs it was A/B'd on.
# Names here must be produced by a current sequence tool
# (test_decide_flips.test_ab_matrix_names_exist_in_sequence).
AB_MATRIX = {
    "RPT_SHADOW_CULL=none (default boxfar)": [
        ("bunny", "bunny_cull_none"), ("shadows", "shadows_cull_none")],
    "RPT_ORDER2=8": [
        ("bunny", "bunny_order2"), ("shadows", "shadows_order2")],
    "RPT_ABOUND=1": [("cubes", "cubes_abound")],
    "windowed texture (WINDOWED_PROVEN)": [
        ("arch", "arch_windowed"), ("cubes", "cubes_windowed")],
    # Post-flip generation (pairing + SUB=8 became the default after the
    # first landed claim): reruns of round4_one_claim A/B the OTHER
    # direction of each flipped knob. For RPT_PAIR=0 / RPT_SUB=4 a FLIP
    # verdict means "revert the r4 default" (back to no-pairing / SUB=4).
    "RPT_PAIR=0 (pairing default ON since r4)": [
        ("bunny", "bunny_nopair"), ("shadows", "shadows_nopair"),
        ("cubes", "cubes_nopair")],
    "RPT_SUB=4 (default 8 since r4)": [("bunny", "bunny_sub4")],
    # RPT_SUB=16 is a NEW direction, not a revert: a FLIP here means
    # RAISE the default to 16 (8x8-lane cones), not go back to 4.
    "RPT_SUB=16 (default 8 since r4; FLIP = adopt 16)": [
        ("bunny", "bunny_sub16")],
    # MSAA fold-vs-loop (VERDICT r4 item 4): baseline is the FOLDED layout,
    # knob is the reference-style per-sample loop. A FLIP means the loop
    # becomes the msaa default (RPT_MSAA_FOLD flips to 0) -- which round 5
    # measured and shipped (ROUND5_CLAIM1.json: 1.44-1.48x).
    "MSAA per-sample loop (FLIP = loop becomes default)": [
        ("bunny_msaa2", "bunny_msaa2_loop"), ("bunny_msaa4", "bunny_msaa4_loop")],
    # Analytic objects through direct XLA intersects instead of the fused
    # kernels (ROUND5_FOLLOWUP.json): measured LOSS on every scene (bunny
    # 7.44 vs 7.25, cubes 15.5 vs 5.5) -- the kernels win even at ONE
    # object; ATTRIB2 puts analytic+merge at 0.27 ms. Stays opt-in.
    "RPT_ANALYTIC_DIRECT=99 (FLIP = adopt direct route)": [
        ("bunny", "bunny_adirect"), ("shadows", "shadows_adirect"),
        ("cubes", "cubes_adirect"), ("arch", "arch_adirect")],
    # Reversed-shadow-cone culling (ROUND5_LEVERS.json, tools/
    # round5_levers.py): only the mesh-shadow scenes -- arch/cubes have no
    # meshes, the knob is inert there. The XL pair rides the same artifact
    # but is advisory (single rep, cache-gated); the flip key is
    # bunny+shadows. Exactness gate: revcone_exact.max_diff ~ 0.
    # MEASURED 2026-08-19: KEEP (bunny -6.3%, shadows -7.8% -- the corpus
    # lights sit close to their meshes; see PERF.md "what lost").
    "RPT_REVCONE=1 (reversed shadow cone; FLIP = adopt)": [
        ("bunny", "bunny_revcone"), ("shadows", "shadows_revcone")],
    # Fused output relayout (ROUND5_POST2.json, tools/round5_post2.py):
    # tonemap before ONE unswizzle+HWC relayout instead of unswizzle + .T.
    # Bit-identical (test_fused_out_is_bit_identical + the claim's
    # fout_exact); the attributed unswizzle share is 0.41 ms on bunny.
    # MEASURED 2026-08-19: KEEP (bunny +1.7%, arch +0.5% -- sub-margin).
    "RPT_FUSED_OUT=1 (fused output relayout; FLIP = adopt)": [
        ("bunny", "bunny_fout"), ("arch", "arch_fout")],
    # Windowed texture kernel for MID atlases only (cap 65536 rows --
    # cube.txt's 32k-row atlas, ROUND5_POST2.json). Distinct from the
    # retired BIG-atlas routing: r4's texprobe proved the kernel exact and
    # wedge-free on this very atlas (max_diff 0.0), so the r4 exactness
    # gate is already satisfied; this entry is purely the speed verdict.
    # MEASURED 2026-08-19: FLIP (+5.4%) -- WINDOWED_MID_CAP=65536 is now
    # the default routing for mid atlases.
    "windowed texture MID cap 65536 (FLIP = adopt for cube-size atlases)": [
        ("cube", "cube_windowed")],
    # Division-free texture addressing (tools/round5_texaddr.py): the fused
    # attribute select carries the per-object tile_params rows [sm1 ss r16]
    # so the per-ray path drops the pow2-grid derivation and integer
    # divisions (ROUND5_POST.json: 1.07 ms of bunny's 1.17 ms texture
    # share is address math). Bit-exact in CI
    # (test_sampler_9row_fp_matches_6row, test_texaddr_fast_end_to_end)
    # and on-chip via the claim's texaddr_exact step.
    # MEASURED 2026-08-19: FLIP (bunny +6.4%, arch +4.6%, cubes +8.0%,
    # cube +7.4%; texaddr_exact max_diff 0.0) -- DEFAULT ON since then;
    # the sequence tool now forces the baseline direction explicitly so
    # these step names keep their meaning on reruns.
    "RPT_TEXADDR_FAST=1 (FLIP = adopt 9-row addressing)": [
        ("bunny", "bunny_texaddr"), ("arch", "arch_texaddr"),
        ("cubes", "cubes_texaddr"), ("cube", "cube_texaddr")],
    # Doubled mesh-kernel blocks (tools/round5_nb.py): the floor probe
    # (ROUND5_FLOOR.json, bunny all-miss floor 4.33 of 6.39 ms) points at
    # per-block fixed costs; NB=2048 halves the block count of the two
    # mesh kernels + both list builds. Two variants: SUB=8 keeps the cull
    # pass cheap (256-lane quad sub-cones), SUB=16 keeps today's 128-lane
    # strip granularity. Exactness gate: nb_exact frac_gt_1e3 ~ 0 (tie
    # flips allowed; CI pins grouping-independence).
    "RPT_NB=2048 + SUB=8 (FLIP = adopt doubled blocks)": [
        ("bunny", "bunny_nb2048"), ("shadows", "shadows_nb2048")],
    "RPT_NB=2048 + SUB=16 (FLIP = adopt doubled blocks, strip subs)": [
        ("bunny", "bunny_nb2048_sub16"),
        ("shadows", "shadows_nb2048_sub16")],
}

# Pre-flip generation, frozen: these step names were produced by the
# round4_one_claim.py that ran BEFORE the PAIR/SUB defaults flipped, and
# exist only in the landed ROUND4_ONECLAIM.json of 2026-08-19. They are the
# measured basis for the r4 defaults (PAIR+SUB8: bunny 7.996 -> 7.324 ms,
# +8.4%) and are exempt from the source-name check; a rerun of the current
# tools will not regenerate them and their rows simply read as absent.
LEGACY_AB_MATRIX = {
    "RPT_PAIR=1 (pre-flip)": [
        ("bunny", "bunny_pair"), ("shadows", "shadows_pair"),
        ("cubes", "cubes_pair")],
    "RPT_ORDER2=8 + RPT_PAIR=1 (pre-flip)": [("bunny", "bunny_order2_pair")],
    "RPT_PAIR=1 + RPT_ABOUND=1 (pre-flip)": [("cubes", "cubes_pair_abound")],
    "RPT_SUB=8 (pre-flip)": [("bunny", "bunny_sub8")],
    "RPT_PAIR=1 + RPT_SUB=8 (pre-flip)": [("bunny", "bunny_pair_sub8")],
}


def _ms(steps: dict, name: str):
    entry = steps.get(name) or {}
    res = entry.get("result")
    if isinstance(res, (int, float)):
        return float(res)
    return None


def decide(art: dict) -> list[dict]:
    steps = art.get("steps", {})
    tex = (steps.get("texprobe") or {}).get("result") or {}
    tex_exact = isinstance(tex.get("max_diff"), (int, float)) \
        and tex["max_diff"] < 1e-5
    out = []
    for knob, pairs in {**AB_MATRIX, **LEGACY_AB_MATRIX}.items():
        rows, any_missing, any_loss = [], False, False
        for base_name, ab_name in pairs:
            base, ab = _ms(steps, base_name), _ms(steps, ab_name)
            rows.append((base_name, base, ab_name, ab))
            if base is None or ab is None:
                any_missing = True
            elif not ab < base * (1 - MARGIN):
                any_loss = True
        # A measured non-win disqualifies regardless of missing pairs (a
        # budget-truncated run must not hide a loss behind NO DATA); only a
        # fully-measured uniform win flips.
        if any_loss:
            verdict = "KEEP"
        elif any_missing:
            verdict = "NO DATA"
        else:
            verdict = "FLIP"
        # Only the BIG-atlas windowed entry demands a same-artifact
        # texprobe: the MID entry's exactness proof is the LANDED r4
        # texprobe on cube.txt's own atlas (ROUND4_ONECLAIM.json
        # max_diff 0.0) plus the CI end-to-end equality test.
        if (knob.startswith("windowed texture (") and verdict == "FLIP"
                and not tex_exact):
            verdict = "KEEP (texprobe not exact/absent)"
        out.append({"knob": knob, "verdict": verdict, "rows": rows})
    return out


def main(argv: list[str]) -> int:
    path = pathlib.Path(argv[0]) if argv else (
        pathlib.Path(__file__).resolve().parent.parent
        / "ROUND4_ONECLAIM.json")
    if not path.exists():
        print(f"no artifact at {path} -- run tools/round4_one_claim.py first")
        return 0
    art = json.loads(path.read_text())
    print(f"artifact: {path} (platform {art.get('platform')}, "
          f"version {art.get('version')}, {art.get('resolution')})")
    for d in decide(art):
        if all(ab is None for _, _, _, ab in d["rows"]):
            continue  # knob generation not present in this artifact
        print(f"\n{d['knob']}: {d['verdict']}")
        for base_name, base, ab_name, ab in d["rows"]:
            fmt = lambda v: f"{v:.3f} ms" if v is not None else "missing"
            delta = (f"  ({(1 - ab / base) * 100:+.1f}%)"
                     if base and ab else "")
            print(f"  {base_name}: {fmt(base)}  vs  {ab_name}: "
                  f"{fmt(ab)}{delta}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
