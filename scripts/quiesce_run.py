"""Steal-gated runner (round 15): waits for a quiet hypervisor window
(steal fraction below a threshold over a probe interval) before
exec'ing the given command, so measurements land in clean windows on a
host where neighbor-VM steal arrives in multi-minute waves (measured
0-12%). Gives up after ``max_wait`` and runs anyway, flagging it.

Usage: python scripts/quiesce_run.py [--steal 0.01] [--probe 20]
           [--max-wait 1800] -- cmd arg...
"""

from __future__ import annotations

import subprocess
import sys
import time


def steal_frac(seconds: float) -> float:
    def jiffies():
        return list(map(int, open("/proc/stat").readline().split()[1:]))
    a = jiffies()
    time.sleep(seconds)
    b = jiffies()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return d[7] / tot if tot and len(d) > 7 else 0.0


def main() -> None:
    args = sys.argv[1:]
    thresh, probe, max_wait = 0.01, 20.0, 1800.0
    while args and args[0].startswith("--"):
        if args[0] == "--":
            args = args[1:]
            break
        key, val = args[0], args[1]
        if key == "--steal":
            thresh = float(val)
        elif key == "--probe":
            probe = float(val)
        elif key == "--max-wait":
            max_wait = float(val)
        args = args[2:]
    t0 = time.time()
    while True:
        s = steal_frac(probe)
        waited = time.time() - t0
        if s <= thresh:
            print(f"[quiesce] steal={s:.4f} after {waited:.0f}s wait — go",
                  file=sys.stderr)
            break
        if waited > max_wait:
            print(f"[quiesce] gave up at {waited:.0f}s (steal={s:.4f}) — "
                  f"running anyway, treat results as suspect",
                  file=sys.stderr)
            break
        print(f"[quiesce] steal={s:.4f} > {thresh} — waiting",
              file=sys.stderr)
        time.sleep(30)
    raise SystemExit(subprocess.call(args))


if __name__ == "__main__":
    main()
