"""Run ONE gated scaling leg at the 4.3M-turn size and merge it into
SCALING_DETAIL.json (all_runs + best + recomputed efficiencies).

Exists so a single diluted leg can be retried without re-burning the
~12-minute local[2] leg (the round-6 post-cutover sweep landed a clean
cpu-matched local[2] but both local[8] attempts drew co-tenant bursts).
Usage: python tools/run_scaling_leg.py <threads> [entities]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    n = int(sys.argv[1])
    entities = int(sys.argv[2]) if len(sys.argv) > 2 else 256000
    sp = bench._bench_transcripts_path(entities)
    gate = bench._wait_quiet(int(os.environ.get("SPARK_GRAFT_SCALING_QUIET_WAIT", "900")))
    leg = bench.run_er_pipeline_subprocess(f"local[{n}]", n, sp)
    leg["launch_gate"] = gate
    print("LEG " + json.dumps(leg), flush=True)

    path = "SCALING_DETAIL.json"
    detail = json.load(open(path))
    detail["all_runs"].setdefault(f"local{n}", []).append(leg)

    def _best(legs):
        ok = [r for r in legs if r.get("cpu_matched") is not False]
        return max(ok or legs, key=lambda r: r["turns_per_sec"])

    levels = sorted(int(k[5:]) for k in detail["all_runs"])
    best = {str(m): _best(detail["all_runs"][f"local{m}"]) for m in levels}
    detail["best"] = best

    effs = {}
    for lo, hi in zip(levels, levels[1:]):
        ratio = hi / lo
        blo, bhi = best[str(lo)], best[str(hi)]
        effs[f"efficiency_{lo}_to_{hi}"] = round(
            (bhi["turns_per_sec"] / blo["turns_per_sec"]) / ratio, 3)
        p_lo, p_hi = blo.get("probe_sec"), bhi.get("probe_sec")
        if p_lo and p_hi:
            effs[f"efficiency_{lo}_to_{hi}_probe_norm"] = round(
                (bhi["turns_per_sec"] * p_hi) / (blo["turns_per_sec"] * p_lo) / ratio, 3)
        c_lo, c_hi = blo["cpu_sec"], bhi["cpu_sec"]
        effs[f"cpu_matched_{lo}_to_{hi}"] = bool(
            0.75 <= c_hi / c_lo <= 1.333
            and blo.get("cpu_matched") is not False
            and bhi.get("cpu_matched") is not False)
    lo, hi = levels[0], levels[1] if len(levels) > 1 else levels[0]
    stage_eff = {
        s: round((best[str(lo)]["stages"][s] / best[str(hi)]["stages"][s]) / (hi / lo), 3)
        for s in best[str(hi)]["stages"]
        if best[str(hi)]["stages"].get(s) and best[str(lo)]["stages"].get(s)
    } if hi != lo else {}
    compact = {
        "metric": "scaling_efficiency_n_to_4n",
        "value": effs.get(f"efficiency_{levels[0]}_to_{levels[0] * 4}"),
        "unit": "ratio",
        **effs,
        "stage_eff": stage_eff,
        **{f"local{m}": bench._er_summary(best[str(m)]) for m in levels},
        "entities": entities,
    }
    detail["compact"] = compact
    with open(path, "w") as f:
        json.dump(detail, f, indent=1)
    print("COMPACT " + json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
