"""Per-stage attribution for the high scaling pair (verdict r03 #4).

Runs the headline dedup job once per parallelism level in fresh
processes with ``DEDUP_RAY_PHASES=1``, parses the ``[dedup-phase]``
lap lines, and prints a per-stage efficiency table for the (N, 4N)
pair. Single-pass by design (attribution, not the committed headline
protocol — BENCH/BASELINE.md's interleaved min-of-2 stays the
measurement of record); per-stage numbers inherit the documented
±25-50% box noise.

Usage: python tools/scaling_phases.py [rows] [ncpu_low] [ncpu_high]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys


def run_level(ncpu: int, rows: int) -> tuple[float, dict[str, float]]:
    env = dict(os.environ,
               DEDUP_RAY_PHASES="1", DEDUP_BENCH_ONCE="1",
               DEDUP_BENCH_ROWS=str(rows), RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"level {ncpu} failed:\n{out.stderr[-2000:]}")
    phases: dict[str, float] = {}
    for m in re.finditer(
            r"\[dedup-phase\] ([^:\n]+(?::[^:\n]+)?): ([\d.]+)s",
            out.stdout):
        phases[m.group(1)] = phases.get(m.group(1), 0.0) + float(m.group(2))
    total = None
    for line in out.stdout.splitlines():
        if line.startswith("{") and '"metric"' in line:
            total = json.loads(line)["value"]
    if total is None:
        raise RuntimeError(f"level {ncpu}: no bench JSON in stdout")
    return total, phases


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_600_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    t_lo, p_lo = run_level(lo, rows)
    print(f"level {lo}: {t_lo:.1f}s  phases={p_lo}", flush=True)
    t_hi, p_hi = run_level(hi, rows)
    print(f"level {hi}: {t_hi:.1f}s  phases={p_hi}", flush=True)
    ratio = hi / lo
    print(f"\nrows={rows}  T{lo}={t_lo:.1f}s  T{hi}={t_hi:.1f}s  "
          f"pair efficiency={(t_lo / t_hi) / ratio:.3f}\n")
    print(f"| stage | t{lo} (s) | t{hi} (s) | per-stage eff {lo}->{hi} |")
    print("|---|---|---|---|")
    for k in p_lo:
        a, b = p_lo[k], p_hi.get(k, float("nan"))
        eff = (a / b) / ratio if b and b == b else float("nan")
        print(f"| {k} | {a:.1f} | {b:.1f} | {eff:.2f} |")


if __name__ == "__main__":
    main()
