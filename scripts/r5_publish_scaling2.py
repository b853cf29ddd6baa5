#!/usr/bin/env python
"""Publish round-5 scaling evidence (distribution form).

Round-5 measurement finding (BENCH/ANALYSIS.md "host variance"): this
shared VM's wall time for the SAME pinned leg, warm cache, <2% reported
steal, varies by up to 2.9x within one hour (pin8: 91.0-239.2 s; pin2:
215.4-445.4 s; pin32: 86.2-246.8 s), and neither /proc/stat steal nor a
memory-bandwidth probe predicts the state — co-tenant pressure is
invisible from inside the guest.  A single "calm" triple is therefore
not honest evidence; this publisher replaces it with:

  * the full per-leg sample (every calm-ish capture this round),
  * per-leg min/median/max — min-of-N is the estimator of the
    machine-limited wall under one-sided contention noise,
  * the 2->8 ratio three ways: best/best, median/median, and the set of
    temporally-adjacent same-block ratios (the ratio is far more stable
    than the absolute walls because host state multiplies both legs),
  * the 600k -> 2M scale trend for the 2->8 pair (the criterion's
    regime is a 10^10-URL frontier; efficiency rises with work size as
    the fixed driver floor amortizes).

Inputs: BENCH/r5_state_reps.jsonl (state-tagged harness samples) plus
the calm-gated .out captures from scripts/r5_scaling.sh sessions.
Outputs: BENCH/scaling.json (new schema v2) and the results section of
BENCH/BASELINE.md (rewritten between markers).
"""
from __future__ import annotations

import json
import statistics
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "BENCH"

# Round-5 final finding (BENCH/ANALYSIS.md "the 14M campaign"): host
# contention is WIDTH-DEPENDENT — a co-tenant that leaves an 8-core
# pinned leg at its best-ever wall (851.1 s @ 0.08% steal, 14M) inflates
# concurrent 32-core legs 1.6-3.7x over their fast-era walls (pin32@10M
# re-reads 508.5/693.6/1095.8 s vs 295.9 fast-era; pin32@14M never got a
# fast-era draw).  GC (27 s of 682.6 s, zero full GCs), heap (42.8 G
# peak of 48 G), swap (none) and run-averaged visible steal (0.28%) are
# all ruled out by the instrumented leg.  Consequence: an adjacent-pair
# ratio between legs of DIFFERENT widths is only honest when the host is
# quiet for the wide leg too — era-suppressed wide legs bias 8->32
# ratios down.  Pairs drawn entirely inside such an era are flagged.
WIDE_SUPPRESSED: dict[tuple[int, int, int], str] = {
    (8, 32, 14000000): (
        "all pin32 14M draws (584.2-682.6 s) fall in the degraded era "
        "whose concurrent pin32@10M re-draws read 1.7-3.7x their "
        "fast-era walls while pin8 legs sit at/below their fast-era "
        "linear projection (851.1 s = 1.35x the 10M best 629.0 s); the "
        "fast-era linear projection for pin32@14M is <=414 s, giving "
        "projected efficiency ~0.51-0.71 — reported as projection only, "
        "no fast-era window recurred to measure it"
    ),
}

# calm-gated captures from the r5_scaling.sh sessions (leg, wall, steal,
# ndocs, session-block id).  Blocks group temporally-adjacent runs; a
# block is a window in which host state is assumed constant (runs
# minutes apart).  Source logs: r5_scaling_driver*.log, r5b/r5c logs.
GATED = [
    # block s1: previous-session calm window (r5_scaling_driver2.log)
    {"cpus": 8, "wall": 98.410, "steal": 0.54, "ndocs": 600000, "block": "s1"},
    {"cpus": 32, "wall": 86.159, "steal": 2.79, "ndocs": 600000, "block": "s1"},
    # block s2: this-session first calm pair (r5c_pin2.log / r5c_pin8.log)
    # 312.2 ran generation-in-JVM (cold corpus cache); 215.4 warm.
    {"cpus": 2, "wall": 312.225, "steal": 0.24, "ndocs": 600000, "block": "s2",
     "note": "corpus generated in-JVM before crawl (cold cache)"},
    {"cpus": 8, "wall": 100.335, "steal": 0.02, "ndocs": 600000, "block": "s2"},
    {"cpus": 2, "wall": 215.409, "steal": 0.03, "ndocs": 600000, "block": "s2"},
    # block s3: blind rep loop (r5c_reps.log) — degraded host state
    {"cpus": 8, "wall": 239.195, "steal": 1.35, "ndocs": 600000, "block": "s3"},
    {"cpus": 2, "wall": 445.359, "steal": 8.45, "ndocs": 600000, "block": "s3"},
]


def load_samples() -> list[dict]:
    out = list(GATED)
    p = BENCH / "r5_state_reps.jsonl"
    if p.exists():
        for i, line in enumerate(p.read_text().splitlines()):
            d = json.loads(line)
            out.append(
                {
                    "cpus": d["cpus"],
                    "wall": d["wall_sec"],
                    "steal": d["cpu_steal_pct"],
                    # the 600k corpus crawls exactly 821,449 URLs; any
                    # other count is the 2M cell (harness < this fix
                    # didn't record ndocs explicitly)
                    "ndocs": d.get("ndocs")
                    or (600000 if d.get("urls_fetched") == 821449 else 2000000),
                    "block": f"h{i}",  # refined below by adjacency
                    "ts": d.get("ts"),
                    "tput": d.get("tput"),
                    "membw_before": d.get("membw_copy_gbs_before"),
                    "membw_after": d.get("membw_copy_gbs_after"),
                }
            )
    return out


def stats(ws: list[float]) -> dict:
    return {
        "n": len(ws),
        "min": round(min(ws), 2),
        "median": round(statistics.median(ws), 2),
        "max": round(max(ws), 2),
    }


def main() -> None:
    samples = load_samples()
    # harness samples are appended in temporal order; group consecutive
    # (8,2) and (32,8) harness pairs into adjacency blocks
    hs = [s for s in samples if s["block"].startswith("h")]

    def gap(x: dict, y: dict) -> float:
        # temporal distance between legs; samples predating the ts field
        # count as "far" so they never beat a same-session pair
        if x.get("ts") and y.get("ts"):
            return abs(y["ts"] - x["ts"])
        return 1e9

    i = 0
    while i < len(hs) - 1:
        a, b = hs[i], hs[i + 1]
        if {a["cpus"], b["cpus"]} in ({8, 2}, {32, 8}) and a["ndocs"] == b["ndocs"]:
            # "adjacent" must mean same host state: if the NEXT pair is
            # also pairable and temporally tighter (e.g. a session
            # boundary sits between a and b), skip a rather than pair
            # legs hours apart
            if (
                i + 2 < len(hs)
                and {b["cpus"], hs[i + 2]["cpus"]} in ({8, 2}, {32, 8})
                and b["ndocs"] == hs[i + 2]["ndocs"]
                and gap(b, hs[i + 2]) < gap(a, b)
            ):
                i += 1
                continue
            a["block"] = b["block"] = f"adj{i}"
            i += 2
        else:
            i += 1

    by = lambda n, nd: [s["wall"] for s in samples if s["cpus"] == n and s["ndocs"] == nd]
    all_nd = sorted({s["ndocs"] for s in samples})
    legs_by_nd = {
        nd: {n: stats(by(n, nd)) for n in (2, 8, 32) if by(n, nd)} for nd in all_nd
    }
    legs600 = legs_by_nd.get(600000, {})
    legs2m = legs_by_nd.get(2000000, {})

    def adjacent_ratios(small: int, big: int, nd: int) -> list[dict]:
        out = []
        blocks: dict[str, dict[int, float]] = {}
        probes: dict[str, list[float]] = {}
        for s in samples:
            if s["ndocs"] != nd or s["cpus"] not in (small, big):
                continue
            blocks.setdefault(s["block"], {})[s["cpus"]] = min(
                s["wall"], blocks.get(s["block"], {}).get(s["cpus"], 1e9)
            )
            for k in ("membw_before", "membw_after"):
                if s.get(k):
                    probes.setdefault(s["block"], []).append(s[k])
        for blk, w in sorted(blocks.items()):
            if small in w and big in w:
                # a block's ratio is only honest if host state held across
                # BOTH legs; the 4 membw probes bracketing them are the
                # state witness (round-5 finding: steal alone cannot see
                # co-tenant DRAM/LLC pressure).  max/min <= 1.6 = held.
                pr = probes.get(blk, [])
                consistent = (
                    round(max(pr) / min(pr), 2) <= 1.6
                    if len(pr) >= 4 and min(pr) > 0
                    else None
                )
                out.append(
                    {
                        "block": blk,
                        "wall_small": w[small],
                        "wall_big": w[big],
                        "speedup": round(w[small] / w[big], 3),
                        "efficiency": round(w[small] / w[big] / (big / small), 3),
                        "state_consistent": consistent,
                        "membw_probe_spread": round(max(pr) / min(pr), 2)
                        if len(pr) >= 4 and min(pr) > 0
                        else None,
                    }
                )
        return out

    def pair(small: int, big: int, legs: dict, nd: int) -> dict | None:
        if small not in legs or big not in legs:
            return None
        adj = adjacent_ratios(small, big, nd)
        best = legs[small]["min"] / legs[big]["min"]
        med = legs[small]["median"] / legs[big]["median"]
        k = big / small
        suppressed = WIDE_SUPPRESSED.get((small, big, nd))
        return ({"wide_leg_suppressed": True, "note": suppressed} if suppressed else {}) | {
            "cpus": [small, big],
            "ndocs": nd,
            "efficiency_best_over_best": round(best / k, 3),
            "efficiency_median_over_median": round(med / k, 3),
            "adjacent_blocks": adj,
            "efficiency_adjacent_mean": round(
                statistics.mean(r["efficiency"] for r in adj), 3
            )
            if adj
            else None,
            "efficiency_state_consistent_mean": round(
                statistics.mean(
                    r["efficiency"] for r in adj if r["state_consistent"]
                ),
                3,
            )
            if any(r["state_consistent"] for r in adj)
            else None,
        }

    out = {
        "round": 5,
        "schema": "v2-distribution",
        "host_variance_note": (
            "same pinned leg, warm cache, <2% reported steal: pin8 "
            "91.0-239.2 s, pin2 215.4-445.4 s, pin32 86.2-246.8 s within "
            "hours; steal and membw probes do not predict the state. "
            "min-of-N approximates the uncontended wall; "
            "temporally-adjacent ratios are the honest efficiency "
            "estimator (host state multiplies both legs) — EXCEPT when "
            "the two legs differ in width and the co-tenant is active: "
            "contention is width-dependent (see "
            "width_asymmetry_finding), so a degraded era suppresses "
            "only the wide leg and biases N->4N ratios down."
        ),
        "width_asymmetry_finding": (
            "A co-tenant invisible to /proc/stat steal inflates wide "
            "pinned legs only: during the same hours, pin8@14M drew its "
            "best-ever wall (851.1 s @ 0.08% steal, at the fast-era "
            "linear projection from 10M) while pin32@10M re-drew "
            "508.5-1095.8 s vs its fast-era 295.9 s and pin32@14M never "
            "read below 584.2 s (projection <=414 s).  The instrumented "
            "pin32@14M leg rules out the engine: GC pauses 27.0 s of "
            "682.6 s (zero full GCs), heap peak 42.8 G of 48 G, no "
            "swap, run-averaged steal 0.28%, stage profile "
            "proportionally identical to 10M.  An 8-core leg leaves 24 "
            "cores of physical headroom for the co-tenant; a 32-core "
            "leg fights it for every core and DRAM channel."
        ),
        "legs_600k": legs600,
        "legs_2m": legs2m,
        "legs_by_ndocs": {str(nd): legs_by_nd[nd] for nd in all_nd},
        "pairs": [
            p
            for p in (
                [pair(2, 8, legs_by_nd[nd], nd) for nd in all_nd]
                + [pair(8, 32, legs_by_nd[nd], nd) for nd in all_nd]
            )
            if p
        ],
        "scale_trend_2to8": [
            {"ndocs": nd, "efficiency_adjacent_mean": p["efficiency_adjacent_mean"]}
            for nd in all_nd
            if (p := pair(2, 8, legs_by_nd[nd], nd)) and p["efficiency_adjacent_mean"]
        ],
        "scale_trend_8to32": [
            {
                "ndocs": nd,
                "efficiency_adjacent_mean": p["efficiency_adjacent_mean"],
                **(
                    {"wide_leg_suppressed": True}
                    if p.get("wide_leg_suppressed")
                    else {}
                ),
            }
            for nd in all_nd
            if (p := pair(8, 32, legs_by_nd[nd], nd)) and p["efficiency_adjacent_mean"]
        ],
        "samples": samples,
    }
    (BENCH / "scaling.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in ("legs_600k", "legs_2m", "pairs")}, indent=1))


if __name__ == "__main__":
    main()
