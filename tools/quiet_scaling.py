"""Opportunistic quiet-window scaling sampler.

The sandbox host's external load comes and goes in storms; sound
adjacent-A/B scaling rounds are only obtainable inside quiet windows.
This loop watches the 1-minute loadavg and fires ONE bench --scaling
round (SPARK_GRAFT_SCALE_ROUNDS=1, ~3 min) whenever the host is quiet,
appending to BENCH/scaling_history.jsonl; bench's best-sound/median
reporting then picks up whatever the windows allowed.

Stop by creating /tmp/stop_quiet_scaling or after --max-samples.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STOP = "/tmp/stop_quiet_scaling"


def load1() -> float:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return 99.0


def main() -> None:
    max_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    deadline = time.time() + float(os.environ.get("QUIET_SCALING_BUDGET_S", "14400"))
    taken = 0
    while taken < max_samples and time.time() < deadline:
        if os.path.exists(STOP):
            print("stop file found; exiting")
            return
        ld = load1()
        if ld >= threshold:
            time.sleep(30)
            continue
        # quiet for two consecutive checks before burning a sample
        time.sleep(15)
        if load1() >= threshold:
            continue
        env = dict(os.environ, SPARK_GRAFT_SCALE_ROUNDS="1")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
            capture_output=True, text=True, env=env,
        )
        taken += 1
        try:
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            rep = json.loads(line)
            print(json.dumps({
                "sample": taken, "load_before": ld,
                "raster_eff": rep["round_efficiencies"],
                "hybrid_eff": rep["round_efficiencies_hybrid"],
                "loads_after": rep["round_loads_after"],
                "took_s": round(time.time() - t0, 1),
            }), flush=True)
        except (IndexError, KeyError, json.JSONDecodeError):
            print("sample failed:", r.stderr[-300:], flush=True)
        # let the host settle before judging the next window
        time.sleep(60)


if __name__ == "__main__":
    main()
