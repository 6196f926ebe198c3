"""Run ONE command in the next quiet host window.

The sandbox host's external load comes in storms (observed load1 > 100
with zero sandbox processes); wall-clock measurements taken inside a
storm are garbage. This helper polls the 1-minute loadavg and launches
the given command once two consecutive checks fall under the threshold,
then exits with the command's status. Companion to quiet_scaling.py
(which loops); this one is for one-shot jobs like the polygon sweep.

Usage: python tools/quiet_once.py <threshold> <budget_s> -- cmd args...
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def load1() -> float:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return 99.0


def main() -> int:
    sep = sys.argv.index("--")
    threshold = float(sys.argv[1])
    budget = float(sys.argv[2])
    cmd = sys.argv[sep + 1 :]
    deadline = time.time() + budget
    while time.time() < deadline:
        if load1() < threshold:
            time.sleep(15)
            if load1() < threshold:
                print(f"quiet window (load1={load1():.2f}); running: {cmd}",
                      flush=True)
                return subprocess.run(cmd).returncode
        time.sleep(30)
    print("budget exhausted without a quiet window", flush=True)
    return 75  # EX_TEMPFAIL


if __name__ == "__main__":
    raise SystemExit(main())
