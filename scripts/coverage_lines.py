#!/usr/bin/env python3
"""Line coverage for the test suite without pytest-cov (absent from this
image): a ``sys.monitoring`` (PEP 669, Python 3.12+) LINE listener with
self-disabling locations — each (code, line) pair costs one callback ever,
so overhead stays low enough to run the whole suite.

Usage:
    python scripts/coverage_lines.py [pytest args...]
    # e.g. python scripts/coverage_lines.py tests/ -q

Writes ``/tmp/linecov.json`` mapping file -> {"executable": N, "missed":
[lines...]} for every ``tactilesr_tpu`` source, and prints a per-file
summary sorted by missed-line count.  Lines run only in subprocesses
(CLI/process-level tests) show as missed here — cross-check before
treating a gap as real.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "tactilesr_tpu")
OUT = os.environ.get("LINECOV_OUT", "/tmp/linecov.json")

executed = {}  # filename -> set of lines

TOOL = sys.monitoring.COVERAGE_ID


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        executed.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE


def executable_lines(path):
    """All statement lines of a source file, from co_lines() of the compiled
    module and every nested code object."""
    with open(path) as f:
        src = f.read()
    lines = set()
    stack = [compile(src, path, "exec")]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def main():
    sys.monitoring.use_tool_id(TOOL, "linecov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    args = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(args)

    sys.monitoring.set_events(TOOL, 0)
    report = {}
    total_exec = total_missed = 0
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            exe = executable_lines(path)
            hit = executed.get(path, set())
            missed = sorted(exe - hit)
            rel = os.path.relpath(path, REPO)
            report[rel] = {"executable": len(exe), "missed": missed}
            total_exec += len(exe)
            total_missed += len(missed)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n== line coverage (in-process only) -> {OUT} ==")
    for rel, r in sorted(
        report.items(), key=lambda kv: -len(kv[1]["missed"])
    ):
        n, m = r["executable"], len(r["missed"])
        if m:
            pct = 100 * (n - m) / n if n else 100
            print(f"{m:5d} missed / {n:5d}  ({pct:5.1f}%)  {rel}")
    pct = 100 * (total_exec - total_missed) / total_exec
    print(f"TOTAL: {total_missed} missed / {total_exec} ({pct:.1f}% covered)")
    sys.exit(rc)


if __name__ == "__main__":
    main()
