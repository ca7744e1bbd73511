"""Collective traffic analysis of compiled (SPMD-partitioned) HLO text.

GSPMD inserts the collectives; this module turns a compiled program's HLO
into *bytes moved per execution per device* — the quantity an ICI roofline
needs — by walking the computation call graph and multiplying while-loop
bodies by their `known_trip_count` (the layer `lax.scan` appears once in
HLO but runs n_layers times).

Used by tools/project_v5e8.py (computed multi-chip projection, replacing
the round-2 "linear scaling" prose) and tests/test_collective_audit.py
(byte budgets, not just op counts).

Cost model (ring algorithms over a torus axis of size g):
  all-gather        result_bytes · (g-1)/g      received per device
  reduce-scatter    result_bytes · (g-1)        sent per device (input = g·result)
  all-reduce        2 · bytes · (g-1)/g         (reduce-scatter + all-gather)
  collective-permute  bytes                     one hop
  all-to-all        bytes · (g-1)/g
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "s4": 1, "u4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "reduce-scatter", "all-to-all",
    "collective-permute",
)
# op definition: `%name = <result type> opcode(`; `-start` variants are the
# async forms (their `-done` twin carries no additional traffic)
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%[\w.\-]+ = (.*?)\s"
    r"(" + "|".join(_COLLECTIVE_OPS) + r")(?:-start)?\((.*)$"
)
# param lists may nest parens (tuple-typed params) — greedy match to `->`
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%([\w.\-]+)\s*\(.*\)\s*->")
_WHILE_RE = re.compile(
    r"while\(.*?condition=%([\w.\-]+), body=%([\w.\-]+)"
    r".*?(?:known_trip_count\W+n\W+?(\d+))?",
)
_CALL_RE = re.compile(r"(?:to_apply|calls)=%([\w.\-]+)")
_BRANCH_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_GROUPS_RE = re.compile(r"replica_groups=\{\{([\d,]*)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _type_bytes(type_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def split_computations(hlo: str) -> Dict[str, str]:
    """computation name -> its body text (brace-balanced blocks)."""
    comps: Dict[str, str] = {}
    lines = hlo.splitlines()
    i = 0
    while i < len(lines):
        m = _COMP_RE.match(lines[i])
        if m and lines[i].rstrip().endswith("{"):
            name = m.group(1)
            depth = 1
            body = [lines[i]]
            i += 1
            while i < len(lines) and depth > 0:
                depth += lines[i].count("{") - lines[i].count("}")
                body.append(lines[i])
                i += 1
            comps[name] = "\n".join(body)
        else:
            i += 1
    return comps


def _entry_name(hlo: str) -> str:
    m = re.search(r"^ENTRY\s+%([\w.\-]+)", hlo, re.M)
    if m:
        return m.group(1)
    # fall back: the computation declared with `ENTRY` keyword inline
    m = re.search(r"ENTRY\s+%?([\w.\-]+)", hlo)
    return m.group(1) if m else next(iter(split_computations(hlo)))


def computation_multiplicities(hlo: str) -> Dict[str, float]:
    """How many times each computation body runs per program execution,
    following call/while edges from the entry. While bodies multiply by
    `known_trip_count` (1 if absent — conservative)."""
    comps = split_computations(hlo)
    mult: Dict[str, float] = {}

    def visit(name: str, m: float):
        mult[name] = mult.get(name, 0.0) + m
        body = comps.get(name, "")
        for line in body.splitlines():
            wm = re.search(r"condition=%([\w.\-]+), body=%([\w.\-]+)", line)
            if wm and "while(" in line:
                tc = re.search(r'known_trip_count[^\d]*(\d+)', line)
                n = float(tc.group(1)) if tc else 1.0
                visit(wm.group(2), m * n)
                visit(wm.group(1), m * (n + 1))
                continue
            for cm in _CALL_RE.finditer(line):
                if cm.group(1) != name:
                    visit(cm.group(1), m)
            bm = _BRANCH_RE.search(line)
            if bm:
                for b in re.findall(r"%([\w.\-]+)", bm.group(1)):
                    visit(b, m)

    visit(_entry_name(hlo), 1.0)
    return mult


def collective_defs(comp_text: str) -> List[Tuple[str, int, int]]:
    """(opcode, result_bytes, group_size) per collective definition."""
    out = []
    for line in comp_text.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        result_type, opcode = m.group(1), m.group(2)
        nbytes = _type_bytes(result_type)
        g = 1
        gm = _GROUPS_RE.search(line)
        if gm:
            ids = [x for x in gm.group(1).split(",") if x]
            g = max(len(ids), 1)
        else:
            gi = _GROUPS_IOTA_RE.search(line)
            if gi:
                g = int(gi.group(2))
        out.append((opcode, nbytes, g))
    return out


def _ici_bytes(opcode: str, nbytes: int, g: int) -> float:
    """Per-device ICI bytes under ring algorithms (module docstring)."""
    if opcode == "collective-permute":
        # permutes carry source_target_pairs, not replica_groups — one hop
        # of the full buffer regardless of parsed group size
        return float(nbytes)
    if g <= 1:
        return 0.0
    if opcode == "all-gather":
        return nbytes * (g - 1) / g
    if opcode == "reduce-scatter":
        return nbytes * (g - 1)
    if opcode == "all-reduce":
        return 2.0 * nbytes * (g - 1) / g
    if opcode == "all-to-all":
        return nbytes * (g - 1) / g
    return float(nbytes)  # collective-permute: one hop


def analyze_collectives(hlo: str) -> dict:
    """Per-execution collective summary of a compiled SPMD program.

    Returns {op: {count, result_bytes, ici_bytes}} plus totals, with
    while-body collectives multiplied by their trip counts. `result_bytes`
    are per-device (SPMD HLO shapes are the local shard)."""
    comps = split_computations(hlo)
    mult = computation_multiplicities(hlo)
    per_op: Dict[str, dict] = {}
    for name, body in comps.items():
        m = mult.get(name, 0.0)
        if m <= 0:
            continue
        for opcode, nbytes, g in collective_defs(body):
            d = per_op.setdefault(
                opcode, {"count": 0.0, "result_bytes": 0.0, "ici_bytes": 0.0}
            )
            d["count"] += m
            d["result_bytes"] += m * nbytes
            d["ici_bytes"] += m * _ici_bytes(opcode, nbytes, g)
    return {
        "per_op": per_op,
        "total_count": sum(d["count"] for d in per_op.values()),
        "total_result_bytes": sum(d["result_bytes"] for d in per_op.values()),
        "total_ici_bytes": sum(d["ici_bytes"] for d in per_op.values()),
    }
