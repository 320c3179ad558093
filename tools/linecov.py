"""First-party line coverage for the tpuvae package via sys.monitoring.

coverage.py is not available in this container, so this is a minimal
PEP 669 collector: every LINE event disables itself after the first hit
(`sys.monitoring.DISABLE`), so steady-state overhead is ~zero even under
JAX tracing.  Executable lines are derived from compiled code objects'
``co_lines`` tables, so the denominator matches what CPython can actually
execute (comments/blank lines excluded).

Usage (wired into tests/conftest.py):

    TPUVAE_LINECOV=1 python -m pytest tests/ -q

writes ``/tmp/tpuvae_linecov.json`` and prints a per-file summary.
Standalone report over an existing JSON:

    python tools/linecov.py report [--min-missing=N]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "tpuvae"
OUT = Path(os.environ.get("TPUVAE_LINECOV_OUT", "/tmp/tpuvae_linecov.json"))

_hits: dict[str, set[int]] = {}
_prefix = str(PKG) + os.sep


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(_prefix):
        _hits.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def start() -> None:
    m = sys.monitoring
    m.use_tool_id(m.COVERAGE_ID, "tpuvae-linecov")
    m.register_callback(m.COVERAGE_ID, m.events.LINE, _on_line)
    m.set_events(m.COVERAGE_ID, m.events.LINE)


def _executable_lines(path: Path) -> set[int]:
    """All line numbers with instructions, from the nested code objects."""
    lines: set[int] = set()
    try:
        top = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return lines
    stack = [top]
    while stack:
        code = stack.pop()
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
        for _, _, line in code.co_lines():
            if line is not None and line > 0:
                lines.add(line)
    return lines


def stop_and_report() -> dict:
    sys.monitoring.set_events(sys.monitoring.COVERAGE_ID,
                              sys.monitoring.events.NO_EVENTS)
    report = {}
    for path in sorted(PKG.rglob("*.py")):
        execable = _executable_lines(path)
        hit = _hits.get(str(path), set()) & execable
        missing = sorted(execable - hit)
        rel = str(path.relative_to(REPO))
        report[rel] = {
            "executable": len(execable),
            "covered": len(hit),
            "pct": round(100.0 * len(hit) / max(1, len(execable)), 1),
            "missing": missing,
        }
    OUT.write_text(json.dumps(report, indent=1))
    return report


def print_summary(report: dict, min_missing: int = 1,
                  file=sys.stderr) -> None:
    total_e = sum(r["executable"] for r in report.values())
    total_c = sum(r["covered"] for r in report.values())
    print(f"\ntpuvae line coverage: {total_c}/{total_e} "
          f"({100.0 * total_c / max(1, total_e):.1f}%) -> {OUT}", file=file)
    rows = sorted(report.items(),
                  key=lambda kv: kv[1]["covered"] - kv[1]["executable"])
    for rel, r in rows:
        miss = r["executable"] - r["covered"]
        if miss >= min_missing:
            print(f"  {r['pct']:5.1f}%  {rel}  ({miss} missing)", file=file)


def _ranges(lines: list[int]) -> str:
    out, i = [], 0
    while i < len(lines):
        j = i
        while j + 1 < len(lines) and lines[j + 1] == lines[j] + 1:
            j += 1
        out.append(str(lines[i]) if i == j else f"{lines[i]}-{lines[j]}")
        i = j + 1
    return ",".join(out)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        rep = json.loads(OUT.read_text())
        min_missing = 1
        for a in sys.argv[2:]:
            if a.startswith("--min-missing="):
                min_missing = int(a.split("=", 1)[1])
        print_summary(rep, min_missing, file=sys.stdout)
        for rel, r in sorted(rep.items()):
            if r["missing"] and len(r["missing"]) >= min_missing:
                print(f"{rel}: missing {_ranges(r['missing'])}")
    else:
        print(__doc__)
