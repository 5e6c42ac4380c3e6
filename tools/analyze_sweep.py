#!/usr/bin/env python
"""Summarize sweep logs (tools/sweep_r02*.log) into one table.

Each sweep step is delimited by '=== <cmd> ===' (tools/sweep_r02*.sh);
this pulls the bench JSON line and/or the bench_step 'ms/step' line from
every section and prints a markdown table for docs/ROADMAP.md.

Usage: python tools/analyze_sweep.py [logfile ...]
"""

import json
import re
import sys


def parse(path):
    rows = []
    cmd, result = None, []
    for line in open(path, errors="replace"):
        m = re.match(r"^=== (.*) ===$", line.strip())
        if m:
            if cmd:
                rows.append((cmd, result))
            cmd, result = m.group(1), []
            continue
        if cmd is None:
            continue
        if line.startswith("{") and '"metric"' in line:
            try:
                j = json.loads(line)
                result.append(
                    f"{j['metric']} = {j['value']} {j.get('unit', '')}"
                    + (f" acc={j['accuracy']}" if "accuracy" in j else ""))
            except json.JSONDecodeError:
                pass
        m = re.search(r"([\d.]+) ms/step \((\d+) steps\)", line)
        if m:
            result.append(f"{m.group(1)} ms/step ({m.group(2)} steps)")
        if "Error" in line or "error" in line.lower()[:40]:
            result.append("ERROR: " + line.strip()[:100])
    if cmd:
        rows.append((cmd, result))
    return rows


def main():
    paths = sys.argv[1:] or ["tools/sweep_r02.log", "tools/sweep_r02b.log"]
    print("| step | result |")
    print("|---|---|")
    for p in paths:
        try:
            rows = parse(p)
        except FileNotFoundError:
            continue
        for cmd, result in rows:
            cmd = cmd.replace("python ", "").replace("timeout 1800 ", "")
            res = "; ".join(dict.fromkeys(result)) or "(no result)"
            print(f"| `{cmd}` | {res} |")


if __name__ == "__main__":
    main()
