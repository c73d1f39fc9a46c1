"""Cross-device collective audit of compiled XLA programs.

Scaling efficiency on a TPU mesh is set by what XLA actually puts on the
ICI wire. These helpers parse the *optimized* HLO of a compiled program
and count/size every cross-device collective, so tests and reports can
pin communication invariants (e.g. "data-sharded extraction lowers to
zero collectives") instead of guessing from the Python source.

Used by ``scripts/scaling_report.py`` (generates ``SCALING.md``) and
``tests/test_scaling_audit.py`` (regression-guards the invariants).
"""

from __future__ import annotations

import re

__all__ = ["audit_collectives", "collective_bytes", "COLLECTIVE_OPS"]

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "c64": 8, "f64": 8, "s64": 8, "u64": 8,
    "c128": 16,
}

#: HLO opcodes that move data across devices.
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
    "collective-broadcast",
    "ragged-all-to-all",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# Instructions may appear as computation roots ("ROOT %x = ...").
_INSTR_RE = re.compile(
    r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.+?)\s+([a-z\-]+?)(-start)?\("
)


def _shape_bytes_one(token: tuple[str, str]) -> int:
    """Byte size of a single ``(dtype, dims)`` shape token."""
    dtype, dims = token
    if dtype not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def _shape_bytes(text: str) -> int:
    """Sum byte sizes of every ``dtype[dims]`` shape token in ``text``."""
    return sum(_shape_bytes_one(t) for t in _SHAPE_RE.findall(text))


def audit_collectives(hlo_text: str) -> dict[str, dict]:
    """Count + size every cross-device collective in optimized HLO text.

    Returns ``{op: {"count": int, "bytes": int}}`` where ``bytes`` sums
    the output shapes (async ``-start``/``-done`` pairs are counted once,
    on the ``-start``; the ``-done`` carries no new transfer).
    """
    out: dict[str, dict] = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line.strip())
        if not m:
            continue
        shapes, op, is_start = m.group(1), m.group(2), m.group(3)
        if op.endswith("-done") or op not in COLLECTIVE_OPS:
            continue
        if is_start:
            # An async "-start" output is a tuple holding BOTH the operand
            # and result buffers — count only the result (the last shape
            # token), or the operand/result would be double-counted.
            tokens = _SHAPE_RE.findall(shapes)
            known = [t for t in tokens if t[0] in _DTYPE_BYTES]
            nbytes = _shape_bytes_one(known[-1]) if known else 0
        else:
            nbytes = _shape_bytes(shapes)
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += nbytes
    return out


def collective_bytes(hlo_text: str) -> int:
    """Total cross-device bytes moved per execution of the program."""
    return sum(r["bytes"] for r in audit_collectives(hlo_text).values())
