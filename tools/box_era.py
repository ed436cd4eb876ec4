#!/usr/bin/env python3
"""Box-era protocol: adjudicate a candidate bench run against the
committed clean reference, and refresh the reference + budgets only
when the protocol's conditions hold (VERDICT r20 item 8 — the r19
hand-executed refresh, made un-mess-up-able).

Usage:
  python3 tools/box_era.py check <candidate.json> [candidate2.json ...]
  python3 tools/box_era.py refresh <candidate.json> [prior_clean.json]
  python3 tools/box_era.py --selftest

The protocol (established r18/r19, BASELINE.md "bench box era drift"):
perf is adjudicated via PER-QUERY ratios against the committed
reference, never one total. A box era has drifted — and the reference
should be refreshed — only when CLEAN runs read a UNIFORM median
ratio past the drift threshold, twice in a row:

  check    For each candidate: print sf-matched per-query median
           ratio vs the committed bench_ref_clean.json, the run's own
           contention verdict, and which refresh conditions it meets.
  refresh  Rewrites bench_ref_clean.json from <candidate.json> and
           regenerates bench_budget.json via make_bench_budget.py —
           but REFUSES unless ALL of:
             (1) the candidate self-reports contended: false;
             (2) the candidate has 0 budget breaches;
             (3) EITHER the candidate's median ratio vs the current
                 reference is <= DRIFT (no era claim needed: a clean
                 faster/parity run at the same HEAD is always a valid
                 reference), OR a second clean run (prior_clean.json)
                 is supplied whose median ratio ALSO exceeds DRIFT —
                 the two-consecutive-clean-runs uniform-drift rule.
           A refusal names the failed condition and exits 1. On
           success it prints the one BASELINE.md line to commit with
           the refresh.

A flagged (contended / breaching) run can never become the reference,
no matter how good its total looks — that is condition (1)/(2), the
rule the r18 2.02x episode was adjudicated under.
"""
import json
import statistics
import subprocess
import sys

DRIFT = 1.25  # uniform-drift threshold (matches graft.Bench's ratio flag)
# A breach within GRACE of its ceiling is measurement quantization,
# not a regression signal: budgets are 2x medians rounded to 3
# decimals, so a run can read 1.0001x its ceiling on a query that
# did not move (r20 run 1: q144 min 0.854107 vs budget 0.854). The
# Bench artifact still REPORTS such breaches; only the refresh gate
# discounts them. Anything past GRACE keeps blocking the refresh.
GRACE = 1.02
REF = "bench_ref_clean.json"
BUDGET = "bench_budget.json"


def load(path):
    with open(path) as f:
        d = json.load(f)
    # Driver BENCH_r{N}.json artifacts wrap the bench line:
    # {"n", "rc", "sf", "tail", "parsed"} where "parsed" (when present)
    # is the headline JSON the bench printed. Unwrap so check/refresh
    # work on either format; sf normalizes to the bench's string form.
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        return d["parsed"]
    return d  # parsed: null or absent -> fields missing -> treated as
              # flagged (conservative: unverifiable runs can't refresh)


def median_ratio(cand, ref):
    """sf-matched per-query median ratio, min-estimator over min-estimator
    (the convention graft.Bench uses for median_ratio_vs_ref)."""
    if cand.get("sf") != ref.get("sf"):
        return None, 0
    # .get, not [] — a headline-only artifact (no "queries" map) at the
    # matching sf must degrade to the documented conservative
    # "no comparable queries" path, not a KeyError (ADVICE r20)
    cq, rq = cand.get("queries"), ref.get("queries")
    if not isinstance(cq, dict) or not isinstance(rq, dict):
        return None, 0
    ratios = [cq[q] / rq[q] for q in cq
              if q in rq and cq[q] > 0 and rq[q] > 0]
    if not ratios:
        return None, 0
    return statistics.median(ratios), len(ratios)


def significant_breaches(cand):
    """Breaches past the GRACE band — the ones that block a refresh.
    Falls back to the raw count when the per-breach detail is absent
    (conservative: cannot prove a breach is quantization noise)."""
    detail = cand.get("budget_breaches")
    if isinstance(detail, dict):
        return [q for q, v in detail.items()
                if v.get("min", 0) > GRACE * v.get("budget", float("inf"))]
    n = cand.get("budget_breach_count", -1)
    return ["<unknown>"] * n if n > 0 else ([] if n == 0 else ["<unparsed>"])


def verdict(cand, ref):
    mr, n = median_ratio(cand, ref)
    box = cand.get("box", {})
    return {
        "median_ratio": mr,
        "n_compared": n,
        "contended": box.get("contended", True),
        "breaches": cand.get("budget_breach_count", -1),
        "significant": significant_breaches(cand),
        "total": cand.get("value"),
        "sf_match": cand.get("sf") == ref.get("sf"),
    }


def cmd_check(paths, ref_path=REF):
    ref = load(ref_path)
    rc = 0
    for p in paths:
        v = verdict(load(p), ref)
        mr = f"{v['median_ratio']:.3f}" if v["median_ratio"] else "n/a"
        clean = (not v["contended"]) and not v["significant"]
        drift = v["median_ratio"] is not None and v["median_ratio"] > DRIFT
        print(f"{p}: total={v['total']} median_ratio={mr} "
              f"(n={v['n_compared']}) contended={v['contended']} "
              f"breaches={v['breaches']} significant={v['significant']} -> "
              f"{'CLEAN' if clean else 'FLAGGED (cannot become reference)'}"
              f"{', uniform drift past %.2f' % DRIFT if clean and drift else ''}")
        if not clean:
            rc = 1
    return rc


def refresh_allowed(cand, ref, prior=None):
    """Return (ok, reason). Pure — the selftest drives it directly."""
    v = verdict(cand, ref)
    if not v["sf_match"]:
        return False, f"sf mismatch: candidate {cand.get('sf')} vs reference {ref.get('sf')}"
    if v["contended"]:
        return False, "candidate self-reports contended: true — a flagged run can never become the reference"
    if v["significant"]:
        return False, (f"candidate has {len(v['significant'])} budget breaches past "
                       f"the {GRACE}x grace band: {v['significant']}")
    if v["median_ratio"] is None:
        return False, "no comparable queries between candidate and reference"
    if v["median_ratio"] <= DRIFT:
        return True, f"clean run at median ratio {v['median_ratio']:.3f} <= {DRIFT} (parity-or-faster refresh)"
    if prior is None:
        return False, (f"median ratio {v['median_ratio']:.3f} > {DRIFT}: era-drift refresh "
                       "needs a SECOND consecutive clean run (pass prior_clean.json)")
    pv = verdict(prior, ref)
    if pv["contended"] or pv["significant"]:
        return False, "prior run is flagged — both era-drift witnesses must be clean"
    if pv["median_ratio"] is None or pv["median_ratio"] <= DRIFT:
        pmr = f"{pv['median_ratio']:.3f}" if pv["median_ratio"] else "n/a"
        return False, (f"prior clean run's median ratio {pmr} does not "
                       f"confirm uniform drift past {DRIFT}")
    return True, (f"two consecutive clean runs at median ratios "
                  f"{pv['median_ratio']:.3f} and {v['median_ratio']:.3f} > {DRIFT} "
                  "— uniform box-era drift confirmed")


def cmd_refresh(cand_path, prior_path=None, ref_path=REF):
    ref = load(ref_path)
    cand = load(cand_path)
    prior = load(prior_path) if prior_path else None
    ok, reason = refresh_allowed(cand, ref, prior)
    if not ok:
        print(f"REFUSED: {reason}", file=sys.stderr)
        return 1
    with open(ref_path, "w") as f:
        json.dump(cand, f)
        f.write("\n")
    subprocess.run([sys.executable, "tools/make_bench_budget.py",
                    ref_path, BUDGET], check=True)
    print(f"refreshed {ref_path} + {BUDGET} from {cand_path}: {reason}")
    print("BASELINE.md line to commit:")
    # the gate allows grace-band breaches, so the provenance line must
    # carry the candidate's ACTUAL count, not a hardcoded zero
    # (ADVICE r20); significant breaches are zero by the gate above
    nb = cand.get("budget_breach_count", 0)
    print(f"  - box-era refresh: {ref_path} <- {cand_path} "
          f"(total {cand.get('value')} s, contended false, "
          f"breaches {nb} (0 significant); {reason})")
    return 0


def selftest():
    ref = {"sf": "sfX", "queries": {"a": 1.0, "b": 2.0, "c": 3.0}}
    def mk(scale, contended=False, breaches=0, sf="sfX", detail=None):
        return {"sf": sf, "value": 6.0 * scale,
                "queries": {q: v * scale for q, v in ref["queries"].items()},
                "box": {"contended": contended},
                "budget_breach_count": breaches,
                "budget_breaches": detail if detail is not None
                else {f"x{i}": {"min": 1.5, "budget": 1.0}
                      for i in range(breaches)}}
    fails = []
    def expect(ok_want, reason_frag, *args):
        ok, reason = refresh_allowed(*args)
        if ok != ok_want or (reason_frag and reason_frag not in reason):
            fails.append(f"want ok={ok_want} reason~'{reason_frag}', got ok={ok} '{reason}'")
    # parity clean run refreshes without a witness
    expect(True, "parity-or-faster", mk(1.0), ref)
    expect(True, "parity-or-faster", mk(0.8), ref)
    # flagged runs always refused
    expect(False, "contended", mk(1.0, contended=True), ref)
    expect(False, "budget breaches", mk(1.0, breaches=3), ref)
    # grace band: a breach within 2% of its ceiling is quantization
    # noise (budgets are 3-decimal-rounded 2x medians) and does not
    # block; past it, blocks — and detail-less artifacts stay blocked
    expect(True, "parity-or-faster",
           mk(1.0, breaches=1, detail={"a": {"min": 0.8541, "budget": 0.854}}), ref)
    expect(False, "grace band",
           mk(1.0, breaches=1, detail={"a": {"min": 1.2, "budget": 0.854}}), ref)
    expect(False, "budget breaches", mk(1.0, breaches=1, detail=None) |
           {"budget_breaches": "unparsed"}, ref)
    # drifted clean run needs a second clean drifted witness
    expect(False, "SECOND consecutive", mk(1.4), ref)
    expect(True, "uniform box-era drift", mk(1.4), ref, mk(1.35))
    expect(False, "must be clean", mk(1.4), ref, mk(1.35, contended=True))
    expect(False, "does not confirm", mk(1.4), ref, mk(1.0))
    # sf mismatch refused
    expect(False, "sf mismatch", mk(1.0, sf="sfY"), ref)
    for f in fails:
        print(f"SELFTEST FAIL: {f}")
    print(f"== box_era selftest {'FAILED' if fails else 'passed'}: "
          "refresh gate conditions ==")
    return 1 if fails else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    if len(sys.argv) > 2 and sys.argv[1] == "check":
        sys.exit(cmd_check(sys.argv[2:]))
    if len(sys.argv) > 2 and sys.argv[1] == "refresh":
        sys.exit(cmd_refresh(sys.argv[2],
                             sys.argv[3] if len(sys.argv) > 3 else None))
    print(__doc__)
    sys.exit(2)
