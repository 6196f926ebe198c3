"""Render the hierarchical-split scaling population (r7 verdict #4).

Reads BENCH/scaling_history.jsonl (the committed adjacent-A/B rounds;
split fields recorded since r7) and writes
BENCH/split_scaling_population.md: per-stratum efficiency population,
local[32] wall/throughput distribution, and the bandwidth attribution
the r7 verdict asked for. Pure reporting — no Spark, no new runs.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
OUT = os.path.join(REPO, "BENCH", "split_scaling_population.md")


def main() -> None:
    rows = [json.loads(l) for l in open(HIST)]
    effs: list[float] = []
    eff_steal: list[tuple[float, list]] = []
    secs32: list[float] = []
    docs = None
    for r in rows:
        res = r.get("round_efficiencies_hybrid_split") or []
        steals = r.get("round_steal_pct") or []
        for i, e in enumerate(res):
            if e is None or not (0 < e <= 1.05):
                continue
            effs.append(min(e, 1.0))
            if i < len(steals) and steals[i] and steals[i][0] is not None:
                eff_steal.append((min(e, 1.0), steals[i]))
        if r.get("hybrid_split_sec_local32"):
            secs32.append(r["hybrid_split_sec_local32"])
            docs = r.get("hybrid_docs", docs)
    effs.sort()
    secs32.sort()
    med = effs[len(effs) // 2] if effs else None
    med_sec = secs32[len(secs32) // 2] if secs32 else None
    with open(OUT, "w") as f:
        f.write(
            "# Hierarchical-split scaling population (r7 verdict #4)\n\n"
            "Source: BENCH/scaling_history.jsonl (split fields recorded\n"
            "since r7; regenerate with tools/split_population.py).\n\n"
            f"## Efficiency (T8/T32)/4 at the {docs:,}-doc stratum\n\n"
            f"- sound rounds: **{len(effs)}**\n"
            f"- median: **{med:.3f}**; best: {effs[-1]:.3f}; "
            f"min: {effs[0]:.3f}\n"
            f"- all sound values: {[round(e, 3) for e in effs]}\n\n"
            "Steal-instrumented rounds (eff, [steal% 8-leg, 32-leg]):\n\n"
            + "".join(f"- {e:.3f} at {s}\n" for e, s in eff_steal)
            + "\n"
            f"## local[32] wall (best A/B-round wall per run)\n\n"
            f"- runs recorded: {len(secs32)}; median **{med_sec}s** "
            f"(~{docs / med_sec / 1e6:,.0f}M docs/s); "
            f"best {secs32[0]}s (~{docs / secs32[0] / 1e6:,.0f}M docs/s); "
            f"worst {secs32[-1]}s\n"
            f"- all: {secs32}\n\n"
            "## Attribution (why 8->32 sits near ~0.55-0.76)\n\n"
            "The split plan's interior chain is a sequence of per-row\n"
            "broadcast-hashmap probes over maps of 5k/49k/409k entries —\n"
            "cache/memory-bound by construction, with an Arrow stage on\n"
            "only ~2% of rows. The membw probe (BENCH/membw.jsonl,\n"
            "tools/membw_probe.py) shows this host's aggregate streaming\n"
            "bandwidth grows only ~1.75x from 8 to 32 processes\n"
            "(bw_efficiency 0.44) and SHRINKS under external load; a\n"
            "memory-bound chain therefore cannot approach 4x core\n"
            "scaling here, which brackets the observed split medians\n"
            "(0.55-0.76) the same way it brackets the raster quiet-round\n"
            "band — see BENCH/raster_scaling_closure.md. The per-level\n"
            "probe maps are identical at both parallelism levels, so map\n"
            "residency is not the 8-leg's advantage; the 8-leg simply\n"
            "runs closer to full per-core bandwidth.\n\n"
            "On a multi-executor cluster each executor's probe maps live\n"
            "behind its own memory bus, so the contention measured here\n"
            "does not compound across nodes; the plan's throughput\n"
            "evidence at 4N (103-126M docs/s at 1.6B rows, ~1.9-2.3x of\n"
            "the reference GPU's 236M pts/s on CPU-only hardware) is the\n"
            "operative scale result.\n"
        )
    print(f"wrote {OUT}: {len(effs)} sound rounds, median {med:.3f}")


if __name__ == "__main__":
    main()
