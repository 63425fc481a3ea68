"""Opportunistic per-leg scaling measurement for a host whose health
flips on sub-minute timescales (BASELINE.md round-5 session 3: serial
canary and PARALLEL canary detach and each swings 10-50x within
minutes; a full interleaved 6->24 pair needs ~20 sustained minutes the
host never offers).

Protocol: poll both canaries; when BOTH are healthy, run ONE leg
(fresh process, `bench.py` with GRAFT_SKIP_QUERIES=1 on the 800k
corpus), then re-check both canaries. A leg counts only when all four
readings (serial+parallel, pre+post) pass the same bars the official
`bench.py --scaling` gate uses — a mid-leg host flip shows up in the
post reading and disqualifies the leg. Levels alternate, preferring
whichever level has fewer certified legs. Efficiency is computed from
the FASTEST certified leg per level (same min-estimator as the
official pair); every attempted leg is logged verbatim to the results
file, certified or not, so the evidence trail is complete.

This measures the same quantity as `bench.py --scaling` (same job,
same corpus, same fresh-process isolation); the only difference is
that the two legs may be minutes apart, each inside its own certified
window — on THIS host that is strictly more faithful to "identical
machines at N and 4N" than a pair straddling a health flip.

Usage: python tools/scaling_hunter.py [deadline_seconds]
Writes: /tmp/scaling_hunt_r5.jsonl (one JSON per attempted leg +
        a final summary line), honoring /tmp/graft_busy.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = os.environ.get("GRAFT_HUNT_RESULTS", "/tmp/scaling_hunt_r5.jsonl")
LEVELS = tuple(int(x) for x in os.environ.get(
    "GRAFT_HUNT_LEVELS", "6,24").split(","))
N_FILES = int(os.environ.get("GRAFT_SCALING_FILES", "800000"))
WANT_PER_LEVEL = int(os.environ.get("GRAFT_HUNT_WANT", "2"))


def canaries() -> tuple[float, float]:
    out = subprocess.run(
        [sys.executable, "-c",
         "from bench import page_fault_canary, parallel_canary; "
         "print(page_fault_canary(256)); print(parallel_canary())"],
        capture_output=True, text=True, cwd=REPO,
    )
    try:
        lines = out.stdout.strip().splitlines()
        return float(lines[-2]), float(lines[-1])
    except Exception:
        return -1.0, -1.0


def canaries_settled(tries: int = 3, gap: float = 8.0) -> tuple[float, float, list]:
    """Element-wise MAX over several spaced readings. The probe reads
    floored for ~10 s immediately after a Ray session tears down (the
    OS reclaims the 60 GB object store; two observed post-leg pairs:
    0.36 GB/s then 96.4 GB/s nine seconds later, 0.25 then 35.8 six
    seconds later), so a single post-leg reading rejects healthy legs.
    A genuinely sick episode (round-3/4: minutes-to-hours) floors ALL
    readings, so the max-estimator still catches what the gate is for
    — the same reasoning as page_fault_canary's best-of-3."""
    trail = []
    best_c = best_p = -1.0
    for i in range(tries):
        c, p = canaries()
        trail.append({"canary_mb_s": c, "parallel_gb_s": p})
        best_c = max(best_c, c)
        best_p = max(best_p, p)
        if healthy(best_c, best_p):
            break  # already certifies; no need to keep probing
        if i < tries - 1:
            time.sleep(gap)
    return best_c, best_p, trail


def healthy(c: float, p: float) -> bool:
    from bench import CANARY_HEALTHY_MB_S, PARALLEL_CANARY_HEALTHY_GB_S

    return c >= CANARY_HEALTHY_MB_S and p >= PARALLEL_CANARY_HEALTHY_GB_S


def log(rec: dict) -> None:
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def run_leg(level: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(level),
               GRAFT_BENCH_FILES=str(N_FILES), GRAFT_SKIP_QUERIES="1")
    t0 = time.monotonic()
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, cwd=REPO)
    wall = time.monotonic() - t0
    try:
        r = json.loads(out.stdout.strip().splitlines()[-1])
        return {"level": level, "sec": r["value"],
                "triples_per_sec": r["triples_per_sec"],
                "leg_wall": round(wall, 1)}
    except Exception:
        return {"level": level, "sec": None, "error": out.stderr[-300:]}


def main() -> None:
    deadline = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1
                              else 4 * 3600)
    certified: dict[int, list[float]] = {lv: [] for lv in LEVELS}
    attempts: dict[int, int] = {lv: 0 for lv in LEVELS}
    while time.time() < deadline:
        if os.path.exists("/tmp/graft_busy"):
            time.sleep(60)
            continue
        c, p = canaries()
        ok = healthy(c, p)
        log({"kind": "poll", "canary_mb_s": c, "parallel_gb_s": p,
             "healthy": ok})
        if not ok:
            time.sleep(40)
            continue
        # fewest certified legs first, then fewest attempts (so the
        # levels alternate while nothing certifies), then low level
        level = min(LEVELS, key=lambda lv: (len(certified[lv]),
                                            attempts[lv], lv))
        attempts[level] += 1
        leg = run_leg(level)
        time.sleep(12)  # let the dead Ray session's reclaim settle
        c2, p2, trail = canaries_settled()
        leg.update({"kind": "leg", "canary_pre": c, "parallel_pre": p,
                    "canary_post": c2, "parallel_post": p2,
                    "post_trail": trail,
                    "certified": bool(leg.get("sec")
                                      and healthy(c2, p2))})
        log(leg)
        if leg["certified"]:
            certified[level].append(leg["sec"])
        done = all(len(v) >= WANT_PER_LEVEL for v in certified.values())
        if done:
            break
    if all(certified[lv] for lv in LEVELS):
        lo, hi = LEVELS
        t_lo, t_hi = min(certified[lo]), min(certified[hi])
        eff = (t_lo / t_hi) / (hi / lo)
        log({"kind": "summary", "metric": "scaling_efficiency",
             "levels": list(LEVELS), f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
             "speedup": round(t_lo / t_hi, 3),
             "scaling_efficiency": round(eff, 3),
             "legs_certified": {str(k): v for k, v in certified.items()},
             "n_files": N_FILES, "protocol": "per-leg certified windows "
             "(tools/scaling_hunter.py; same job/corpus as bench.py "
             "--scaling, each leg gated on serial+parallel canaries "
             "pre AND post)"})
    else:
        log({"kind": "summary", "skipped": "no certified pair",
             "legs_certified": {str(k): v for k, v in certified.items()}})


if __name__ == "__main__":
    main()
