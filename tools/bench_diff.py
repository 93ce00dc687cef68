#!/usr/bin/env python3
"""Cross-round bench regression diff (round-10 VERDICT #1/#7).

Diffs two committed BENCH_LOCAL_r*.json artifacts per query and per decode
metric, so a throughput regression surfaces mechanically instead of relying
on judge vigilance.

    python3 tools/bench_diff.py BENCH_LOCAL_r10.json BENCH_LOCAL_r11.json

Flags:
  * a query whose p90 grew by MORE THAN 1.25x AND more than 300 ms
    (both, so JIT noise on 20 ms queries and a 5% drift on a 2 s query
    don't page anyone);
  * a decode throughput metric (decode_rec_per_s / decode92_rec_per_s /
    decode92_2m_rec_per_s) that dropped by more than 25%;
  * environment mismatches (cpus, sf, registry names_sha, contended) that
    make the comparison unsound — reported first, because a diff across
    different boxes or registries is noise, not signal.

Exit status: 0 = comparable and no flags; 1 = flags raised; 2 = artifacts
not comparable (env mismatch). Output is one human-readable table plus a
final machine-readable JSON line (the same convention as Bench itself).
"""
import json
import sys

RATIO_FLAG = 1.25
ABS_FLAG_MS = 300.0
DECODE_DROP_FLAG = 0.75  # new/old below this = >25% throughput drop

# DECLARED COSTS (round 14) — the bench-diff analog of the scale audit's
# NamedSuperlinear map: when a round SHIPS a deliberate perf-for-quality
# trade, diffing against a baseline that predates the trade flags the
# affected queries even though the cost was declared and bought something
# (here: IvfIncrHierCellsPerGroup 3 -> 4 = 1.33x candidate volume for
# +6.2 pp true recall at the 100x decade, commit 2ddd315, plus the routed
# level-1 build's constant overhead at sf0.1's toy cell count). Entries
# are scoped to the EXPLICIT pre-trade baselines they excuse — a future
# diff against a baseline that already includes the trade gets no
# exemption, so the map cannot mask a real regression going forward.
# A declared query whose ratio exceeds its declared envelope still fails.
DECLARED_COSTS = {
    # round 15: incremental probe width w1 8 -> 12 (IvfIncrHierProbeGroups,
    # 1.5x candidate budget for +9.4 pp measured 100x recall, floor raised
    # 765000 -> 858000). Scoped to the r15 same-box pre-trade baseline; the
    # r14-era entries (t=4 trade) stay scoped to their own baselines.
    "q_dedup_embed_incr_hier": {
        "max_ratio": 2.0,
        "applies_to_baselines": ["BENCH_LOCAL_r15base.json", "BENCH_LOCAL_r14base.json", "BENCH_LOCAL_r13b.json", "BENCH_LOCAL_r13.json"],
        "reason": "r15: probe width w1 8->12 (1.5x candidates, declared; +9.4pp 100x recall); r14: t=4 cell budget",
    },
    "q_ivf_incr_balance": {
        "max_ratio": 2.0,
        "applies_to_baselines": ["BENCH_LOCAL_r15base.json", "BENCH_LOCAL_r14base.json", "BENCH_LOCAL_r13b.json", "BENCH_LOCAL_r13.json"],
        "reason": "audits the incremental index (shares its build + probe relations; r15 w1 8->12, r14 t=4)",
    },
    "q_stream_embeddedup_hier": {
        "max_ratio": 2.0,
        "applies_to_baselines": ["BENCH_LOCAL_r15base.json", "BENCH_LOCAL_r14base.json", "BENCH_LOCAL_r13b.json", "BENCH_LOCAL_r13.json"],
        "reason": "streaming twin of the incremental router (r15 w1 8->12, r14 t=4)",
    },
}


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)

    # --- comparability gate -------------------------------------------------
    env_problems = []
    for key in ("cpus", "spark"):
        a = (old.get("env") or {}).get(key)
        b = (new.get("env") or {}).get(key)
        if a != b:
            env_problems.append(f"env.{key}: {a} vs {b}")
    if old.get("sf") != new.get("sf"):
        env_problems.append(f"sf: {old.get('sf')} vs {new.get('sf')}")
    for name, art in (("old", old), ("new", new)):
        if art.get("contended"):
            env_problems.append(f"{name} artifact is marked contended")
    registry_changed = old.get("names_sha") != new.get("names_sha")

    if env_problems:
        print("NOT COMPARABLE:")
        for p in env_problems:
            print(f"  {p}")
        print(json.dumps({"comparable": False, "problems": env_problems}))
        return 2

    # --- box-identity check (round-14, VERDICT-r13 #3) ----------------------
    # The decode throughput metrics time pure-CPU code that bench rounds do
    # not touch, so a UNIFORM shift across all of them is the box changing
    # speed, not a code regression (the r13 adjudication that previously
    # lived in NOTES prose). When every decode metric dropped by >10% in the
    # same direction, emit environment_shift and rescale the per-query bar
    # by the median decode shift — a query that regressed BEYOND the uniform
    # box shift (mixed-direction) still fails.
    decode_ratios = []
    for key in ("decode_rec_per_s", "decode92_rec_per_s", "decode92_2m_rec_per_s"):
        a, b = old.get(key), new.get(key)
        if a and b:
            decode_ratios.append(b / a)
    env_shift = len(decode_ratios) >= 2 and (
        all(r < 0.9 for r in decode_ratios) or all(r > 1.1 for r in decode_ratios))
    # decode throughput ratio -> expected wall inflation is its inverse
    decode_med = sorted(decode_ratios)[len(decode_ratios) // 2] if decode_ratios else 1.0
    wall_scale = (1.0 / decode_med) if (env_shift and decode_med < 1.0) else 1.0
    if env_shift:
        print(f"ENVIRONMENT SHIFT: decode tier moved uniformly "
              f"({', '.join(f'{r:.2f}x' for r in decode_ratios)}) — "
              f"per-query regression bar rescaled by {wall_scale:.2f}x")

    # --- per-query diff -----------------------------------------------------
    # Basis (round 15, VERDICT-r14 #6): when BOTH artifacts carry the
    # harness-split execution p90s (queries_exec_p90 = wall minus the
    # Trigger.AvailableNow setup constant measured by StreamMeter), diff
    # THOSE — the ~1-2 s/query streaming-harness constant is ~40% of the
    # registry wall and has repeatedly flagged phantom regressions under
    # box-scheduler shifts. Wall p90 remains the fallback so old
    # artifacts stay diffable.
    basis = "exec"
    qo = old.get("queries_exec_p90") or {}
    qn = new.get("queries_exec_p90") or {}
    if not (qo and qn):
        basis = "wall"
        qo = old.get("queries_p90") or old.get("queries") or {}
        qn = new.get("queries_p90") or new.get("queries") or {}
    print(f"per-query basis: {basis} p90"
          + ("" if basis == "exec" else " (exec split absent in one artifact)"))
    shared = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))

    import os
    base_name = os.path.basename(old_path)

    def declared(q, ratio):
        # the declared envelope applies to the shift-NORMALIZED ratio
        # (ADVICE r14: multiplying the envelope by wall_scale compounded
        # the two exemptions — a 1.25x box shift would have let a
        # declared query regress 2.5x without failing)
        e = DECLARED_COSTS.get(q)
        return bool(e) and base_name in e["applies_to_baselines"] \
            and ratio / wall_scale <= e["max_ratio"]

    flagged = []
    declared_cost = []
    improved = []
    ratios = []
    for q in shared:
        a, b = float(qo[q]), float(qn[q])
        if a <= 0:
            continue
        ratio = b / a
        delta_ms = (b - a) * 1000.0
        ratios.append(ratio)
        if ratio > RATIO_FLAG * wall_scale and delta_ms > ABS_FLAG_MS:
            if declared(q, ratio):
                declared_cost.append((q, a, b, ratio, delta_ms))
            else:
                flagged.append((q, a, b, ratio, delta_ms))
        elif ratio < 1.0 / RATIO_FLAG and -delta_ms > ABS_FLAG_MS:
            improved.append((q, a, b, ratio, delta_ms))

    ratios.sort()
    median_ratio = ratios[len(ratios) // 2] if ratios else float("nan")
    tot_old = sum(float(qo[q]) for q in shared)
    tot_new = sum(float(qn[q]) for q in shared)

    print(f"shared queries: {len(shared)}  added: {len(added)}  removed: {len(removed)}")
    if registry_changed:
        print("note: registry names_sha differs (expected when queries were "
              "added); diff covers the shared subset only")
    if shared and tot_old > 0:
        print(f"shared-subset total: {tot_old:.1f}s -> {tot_new:.1f}s "
              f"({tot_new / tot_old:.2f}x)   median per-query ratio: {median_ratio:.2f}x")
    else:
        # disjoint registries that still pass the env gate: report rather
        # than crash on the division (the JSON line below already guards)
        print("no shared queries with nonzero old timings: totals not comparable")

    if flagged:
        print(f"\nREGRESSIONS (> {RATIO_FLAG}x AND > {ABS_FLAG_MS:.0f} ms):")
        for q, a, b, r, d in sorted(flagged, key=lambda t: -t[4]):
            print(f"  {q:32s} {a * 1000:8.0f} ms -> {b * 1000:8.0f} ms  "
                  f"({r:.2f}x, +{d:.0f} ms)")
    else:
        print(f"\nno per-query regression exceeds {RATIO_FLAG}x + {ABS_FLAG_MS:.0f} ms")
    if declared_cost:
        print("declared costs (shipped trade vs a pre-trade baseline — "
              "reported, not failing):")
        for q, a, b, r, d in sorted(declared_cost, key=lambda t: -t[4]):
            print(f"  {q:32s} {a * 1000:8.0f} ms -> {b * 1000:8.0f} ms  "
                  f"({r:.2f}x)  [{DECLARED_COSTS[q]['reason']}]")
    if improved:
        print(f"improvements past the same bar: "
              + ", ".join(f"{q} ({r:.2f}x)" for q, _, _, r, _ in improved))

    # --- decode throughput diff ---------------------------------------------
    decode_flags = []
    decode_table = {}
    for key in ("decode_rec_per_s", "decode92_rec_per_s", "decode92_2m_rec_per_s"):
        a, b = old.get(key), new.get(key)
        if a and b:
            ratio = b / a
            decode_table[key] = {"old": a, "new": b, "ratio": round(ratio, 3)}
            mark = ""
            if ratio < DECODE_DROP_FLAG and not env_shift:
                decode_flags.append(key)
                mark = "  <-- REGRESSION (>25% drop)"
            elif ratio < DECODE_DROP_FLAG:
                mark = "  (uniform environment shift — not flagged)"
            print(f"{key:24s} {a:>12,} -> {b:>12,} rec/s ({ratio:.2f}x){mark}")

    result = {
        "comparable": True,
        "basis": basis,
        "shared": len(shared),
        "added": added,
        "removed": removed,
        "total_ratio": round(tot_new / tot_old, 3) if tot_old else None,
        "median_ratio": round(median_ratio, 3) if ratios else None,
        "flagged": [q for q, *_ in flagged],
        "declared_cost": [q for q, *_ in declared_cost],
        "improved": [q for q, *_ in improved],
        "decode": decode_table,
        "decode_flagged": decode_flags,
        "environment_shift": env_shift,
    }
    print(json.dumps(result))
    return 1 if (flagged or decode_flags) else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
