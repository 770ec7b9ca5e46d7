"""Trial scoring + EER/minDCF CLI.

Behavioral contract (reference: speakerlab/bin/compute_score_metrics.py):
collect embedding archives for enrol/test sides, score each trial list with
cosine similarity, write `<trial>.score` files ("enrol test label score"),
log EER / EER threshold / minDCF into `result.metrics`, and (if matplotlib
is present) save EER curve plots.

Usage:
  python -m speaker3d_tpu.cli.compute_score_metrics \
      --enrol_data exp/foo/embeddings --test_data exp/foo/embeddings \
      --scores_dir exp/foo/scores --trials trials.txt [...]
"""

from __future__ import annotations

import argparse
import os

from speaker3d_tpu.eval.scoring import load_embeddings, load_trials, score_trials
from speaker3d_tpu.utils.metrics import compute_eer, compute_min_dcf, fnr_fpr_curve


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Compute scores and metrics")
    p.add_argument("--enrol_data", required=True)
    p.add_argument("--test_data", required=True)
    p.add_argument("--scores_dir", required=True)
    p.add_argument("--trials", nargs="+", required=True)
    p.add_argument("--p_target", default=0.01, type=float)
    p.add_argument("--c_miss", default=1.0, type=float)
    p.add_argument("--c_fa", default=1.0, type=float)
    p.add_argument("--det_plot", action="store_true",
                   help="also write a normal-deviate DET curve per trial "
                        "(reference: utils/score_metrics.py plot_det_curve)")
    return p.parse_args(argv)


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    args = get_args(argv)
    os.makedirs(args.scores_dir, exist_ok=True)
    result_path = os.path.join(args.scores_dir, "result.metrics")

    enrol = load_embeddings(args.enrol_data)
    test = (enrol if os.path.abspath(args.test_data)
            == os.path.abspath(args.enrol_data) else
            load_embeddings(args.test_data))

    lines_out = []
    for trial_path in args.trials:
        name = os.path.basename(trial_path)
        trials = load_trials(trial_path)
        scores, labels = score_trials(enrol, test, trials)

        with open(os.path.join(args.scores_dir, f"{name}.score"), "w") as f:
            for (e, t, y), s in zip(trials, scores):
                f.write(f"{e} {t} {y} {s:.5f}\n")

        fnr, fpr = fnr_fpr_curve(scores, labels)
        eer, thres = compute_eer(scores, labels, return_threshold=True)
        min_dcf = compute_min_dcf(fnr=fnr, fpr=fpr, p_target=args.p_target,
                                  c_miss=args.c_miss, c_fa=args.c_fa)
        lines_out += [
            f"Results of {name} is:",
            f"EER = {100 * eer:.4f}",
            f"EER_thres = {thres:.4f}",
            (f"minDCF (p_target:{args.p_target} c_miss:{args.c_miss} "
             f"c_fa:{args.c_fa}) = {min_dcf:.4f}"),
        ]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure()
            plt.plot(fpr, fnr)
            plt.plot([0, 1], [0, 1], "r--")
            plt.xlabel("FPR")
            plt.ylabel("FNR")
            plt.title(f"{name} EER={100*eer:.3f}%")
            plt.grid(True)
            plt.savefig(os.path.join(args.scores_dir, f"{name}_eer_curves.png"))
            plt.close()
            if args.det_plot:
                from speaker3d_tpu.utils.metrics import plot_det_curve

                plot_det_curve(fnr, fpr, os.path.join(
                    args.scores_dir, f"{name}_det_curve.png"))
        except Exception:
            pass

    with open(result_path, "w") as f:
        f.write("\n".join(lines_out) + "\n")
    print("\n".join(lines_out))


if __name__ == "__main__":
    main()
