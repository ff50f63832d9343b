"""Per-lane post-mortem of the flagship's LINE_SEARCH_FAILED tail.

Round-1 headline: 98.78% of warm-started resolves end SUCCESS; ~1.2%
end LINE_SEARCH_FAILED and keep their warm trajectory. VERDICT r1 asked
for lane-level evidence that the tail is benign (f32-roundoff
non-descent at stiff conic knots, zero closed-loop impact) — this
script produces it from the bench's per-lane-tick arrays.

Usage:
  ALTRO_BENCH_DUMP=/tmp/bench_dump.npz python bench.py
  python scripts/ls_failure_postmortem.py /tmp/bench_dump.npz
"""

import json
import sys

import numpy as np

STATUS_SUCCESS = 0


def main(path):
    d = np.load(path)
    iters = d["iterations"]          # [NSIM, B]
    errs = d["tracking_error"]       # [NSIM, B]
    status = d["status"]             # [NSIM, B]
    nsim, B = status.shape
    fail = status != STATUS_SUCCESS

    fail_rate = fail.mean()
    lanes_ever = fail.any(axis=0)

    # Closed-loop impact: error distribution of lanes that ever failed vs
    # lanes that never failed, and error AT the failing ticks vs overall.
    err_ever = errs[:, lanes_ever].mean() if lanes_ever.any() else float("nan")
    err_never = errs[:, ~lanes_ever].mean() if (~lanes_ever).any() else float("nan")
    err_at_fail = errs[fail].mean() if fail.any() else float("nan")
    final_err_ever = errs[-1, lanes_ever].mean() if lanes_ever.any() else float("nan")
    final_err_never = errs[-1, ~lanes_ever].mean() if (~lanes_ever).any() else float("nan")

    # Transience: does a failing lane recover by the NEXT tick?
    if fail.any():
        f_t, f_b = np.where(fail[:-1])
        recovered_next = (~fail[f_t + 1, f_b]).mean() if len(f_t) else float("nan")
        # run lengths of consecutive failures per lane
        run_lengths = []
        for b in np.where(lanes_ever)[0]:
            col = fail[:, b].astype(int)
            run = 0
            for v in col:
                if v:
                    run += 1
                elif run:
                    run_lengths.append(run)
                    run = 0
            if run:
                run_lengths.append(run)
        run_lengths = np.asarray(run_lengths)
        p95_run = float(np.percentile(run_lengths, 95)) if len(run_lengths) else 0.0
        max_run = int(run_lengths.max()) if len(run_lengths) else 0
    else:
        recovered_next, p95_run, max_run = float("nan"), 0.0, 0

    # Iteration burden: failed resolves burn the full iteration budget?
    it_fail = iters[fail].mean() if fail.any() else float("nan")
    it_ok = iters[~fail].mean()

    # Tick clustering: are failures localized to specific path events
    # (stiff reference segments) rather than spread lane-randomly?
    per_tick = fail.mean(axis=1)
    worst = np.argsort(per_tick)[::-1][:10]
    tick_cluster = {
        "ticks_with_any_failure": int((per_tick > 0).sum()),
        "ticks_above_5pct": int((per_tick > 0.05).sum()),
        "worst_ticks": {int(t): round(float(per_tick[t]), 4) for t in worst},
        "frac_failures_in_worst10": round(
            float(per_tick[worst].sum() / per_tick.sum()), 4
        ) if per_tick.sum() else 0.0,
    }

    # Cross-implementation adjudication against the reference's own
    # scotty_mpc artifact (/root/reference/test/scotty_mpc.json,
    # bicycle_test.cpp:344-359): per-tick solve_iters show where the
    # reference solver itself struggles, and per-tick tracking error
    # shows whether our failing ticks change the closed loop at all.
    ref_path = "/root/reference/test/scotty_mpc.json"
    try:
        ref = json.load(open(ref_path))
        rit = np.asarray(ref["solve_iters"], dtype=float)[:nsim]
        rerr = np.asarray(ref["tracking_error"], dtype=float)[:nsim]
        our_err_tick = errs.mean(axis=1)
        tick_cluster.update(
            {
                "ref_max_iter_tick": int(np.argmax(rit)),
                "ref_ticks_ge6_iters": int((rit >= 6).sum()),
                "per_tick_err_corr_vs_ref": round(
                    float(np.corrcoef(our_err_tick, rerr)[0, 1]), 5
                ),
                "mean_abs_err_diff_vs_ref": round(
                    float(np.abs(our_err_tick - rerr).mean()), 5
                ),
            }
        )
    except (OSError, KeyError):
        pass

    out = {
        "ticks": int(nsim),
        "lanes": int(B),
        "resolve_failure_rate": round(float(fail_rate), 5),
        "lanes_ever_failed_frac": round(float(lanes_ever.mean()), 5),
        "mean_err_lanes_ever_failed": round(float(err_ever), 5),
        "mean_err_lanes_never_failed": round(float(err_never), 5),
        "mean_err_at_failing_ticks": round(float(err_at_fail), 5),
        "final_err_lanes_ever_failed": round(float(final_err_ever), 5),
        "final_err_lanes_never_failed": round(float(final_err_never), 5),
        "recovered_by_next_tick_frac": round(float(recovered_next), 5),
        "failure_run_length_p95": p95_run,
        "failure_run_length_max": max_run,
        "mean_iters_failing": round(float(it_fail), 3),
        "mean_iters_succeeding": round(float(it_ok), 3),
        **tick_cluster,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_dump.npz")
