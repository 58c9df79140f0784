"""Static VMEM-footprint linter for the lowered Pallas kernels.

Round 3's relay wedge was (best theory) a 16.7 MB texture atlas placed in
VMEM by a `pl.ANY` block spec -- a mistake that is INVISIBLE on CPU
(interpret mode has no VMEM) and only surfaces as a dead chip. But the
cross-platform lowering (`.lower(lowering_platforms=("tpu",))`, see
tests/test_tpu_lowering.py) embeds each kernel's Mosaic module in its
`tpu_custom_call`, and that module's entry-block signature carries every
ref's shape, dtype and memory space. Decoding it gives a static,
chip-free VMEM budget check.

Scope: sums the DECLARED vmem ref/scratch footprints per kernel. It does
not model Mosaic's internal double-buffering of grid-blocked windows,
vector spills, or fusion temporaries -- so the budget here is a NECESSARY
bound (a kernel failing it is certainly broken), not a sufficient one.
"""

from __future__ import annotations

import base64
import json
import re

# v5e VMEM is ~16 MiB/core minus compiler headroom. A kernel whose declared
# refs alone exceed this can never fit once pipelining doubles the windows.
VMEM_BUDGET_BYTES = 16 * 1024 * 1024

_DTYPE_BYTES = {
    "f32": 4, "f64": 8, "bf16": 2, "f16": 2,
    "i64": 8, "i32": 4, "i16": 2, "i8": 1, "i1": 1,
    "ui64": 8, "ui32": 4, "ui16": 2, "ui8": 1,
}

_CONFIG = re.compile(r'backend_config\s*=\s*"(.*?)(?<!\\)"', re.S)


def _mosaic_modules(lowered_text: str) -> list[bytes]:
    """Decode every tpu_custom_call's serialized Mosaic module."""
    mods = []
    for m in _CONFIG.finditer(lowered_text):
        cfg = m.group(1).replace('\\22', '"').replace("\\n", "")
        try:
            body = json.loads(cfg)["custom_call_config"]["body"]
        except (ValueError, KeyError):
            continue  # a non-Mosaic custom call
        mods.append(base64.b64decode(body + "==="))
    return mods


def _entry_memrefs(module_text: str) -> list[tuple[str, str, str]]:
    """(dims, dtype, space) for each entry-block argument memref.

    Memref types nest angle brackets (`memref<8x128xf32,
    #tpu.memory_space<smem>>`), so the type body is extracted by bracket
    counting, not regex -- a lazy `[^>]*?` would truncate at the inner `>`
    and silently relabel every smem/semaphore ref as vmem."""
    out = []
    for block in re.findall(r"\^bb0\((.*?)\):", module_text, re.S):
        i = 0
        while True:
            j = block.find("memref<", i)
            if j < 0:
                break
            k = j + len("memref<")
            depth = 1
            while k < len(block) and depth:
                if block[k] == "<":
                    depth += 1
                elif block[k] == ">":
                    depth -= 1
                k += 1
            inner = block[j + len("memref<"):k - 1]
            i = k
            m = re.match(r"((?:\d+x)*)(\w+)\s*(?:,|$)", inner)
            if not m:
                continue
            sm = re.search(r"memory_space<(\w+)>", inner)
            space = sm.group(1) if sm else "vmem"  # Mosaic's default space
            out.append((m.group(1), m.group(2), space))
    return out


def _bytes_of(dims: str, dtype: str) -> int:
    n = 1
    for d in dims.split("x"):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def kernel_vmem_footprints(lowered_text: str) -> list[dict]:
    """Per-kernel declared VMEM footprint from lowered StableHLO text.

    Returns [{"name", "vmem_bytes", "n_vmem_refs", "largest_ref_bytes",
    "spaces": {space: bytes}}] -- one entry per tpu_custom_call."""
    from jax._src.lib.mlir import ir

    reports = []
    for raw in _mosaic_modules(lowered_text):
        ctx = ir.Context()
        ctx.allow_unregistered_dialects = True
        text = str(ir.Module.parse(raw, ctx))
        name_m = re.search(r"module @(\w+)", text)
        refs = _entry_memrefs(text)
        spaces: dict[str, int] = {}
        vmem, largest = 0, 0
        for dims, dtype, space in refs:
            b = _bytes_of(dims, dtype)
            spaces[space] = spaces.get(space, 0) + b
            if space == "vmem":
                vmem += b
                largest = max(largest, b)
        reports.append({
            "name": name_m.group(1) if name_m else "?",
            "vmem_bytes": vmem,
            "largest_ref_bytes": largest,
            "n_vmem_refs": sum(1 for *_x, s in refs if s == "vmem"),
            "spaces": spaces,
        })
    return reports


def assert_vmem_budget(lowered_text: str,
                       budget: int = VMEM_BUDGET_BYTES) -> list[dict]:
    """Raise if any kernel's declared VMEM refs exceed the budget; returns
    the per-kernel reports for logging either way.

    Also raises if the text CONTAINS tpu_custom_calls but none decoded to
    a Mosaic module -- a jax version changing the backend_config encoding
    must blind the linter LOUDLY, not let an unvetted artifact through."""
    reports = kernel_vmem_footprints(lowered_text)
    if not reports and "tpu_custom_call" in lowered_text:
        raise AssertionError(
            "tpu_custom_call present but no Mosaic module decoded -- the "
            "VMEM linter cannot see these kernels (backend_config "
            "encoding changed?)")
    over = [r for r in reports if r["vmem_bytes"] > budget]
    if over:
        detail = ", ".join(
            f"{r['name']}: {r['vmem_bytes'] / 2**20:.1f} MiB "
            f"(largest ref {r['largest_ref_bytes'] / 2**20:.1f} MiB)"
            for r in over)
        raise AssertionError(
            f"kernel(s) over the {budget / 2**20:.0f} MiB VMEM budget: "
            f"{detail}")
    return reports
