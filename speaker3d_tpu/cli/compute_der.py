"""DER scoring CLI.

Behavioral contract (reference: egs/3dspeaker/speaker-diarization/local/
compute_der.py + local/DER.py wrapping NIST md-eval.pl): compare hypothesis
RTTMs against reference RTTMs with a +/- collar (default 0.25 s) and
optional ignore-overlap mode; report per-file and overall
MISS/FA/SER/DER percentages.

Usage:
  python -m speaker3d_tpu.cli.compute_der --ref ref.rttm --hyp hyp.rttm \
      [--collar 0.25] [--ignore_overlap]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from speaker3d_tpu.parallel.mesh import init_multihost
    init_multihost()  # multi-host pods: jax.distributed (no-op single-host)
    from speaker3d_tpu.diar.der import (
        compute_der,
        compute_der_for_files,
        load_rttm,
    )

    p = argparse.ArgumentParser(description="Compute diarization error rate")
    p.add_argument("--ref", required=True, help="reference RTTM file")
    p.add_argument("--hyp", required=True, help="hypothesis RTTM file")
    p.add_argument("--collar", type=float, default=0.25)
    p.add_argument("--ignore_overlap", action="store_true")
    args = p.parse_args(argv)

    ref = load_rttm(args.ref)
    hyp = load_rttm(args.hyp)

    for fid in sorted(ref):
        r = compute_der(ref[fid], hyp.get(fid, []), args.collar,
                        args.ignore_overlap)
        print(f"{fid}: {r}")
    total = compute_der_for_files(ref, hyp, args.collar, args.ignore_overlap)
    print(f"OVERALL: {total}")
    print(f"DER = {100 * total.der:.2f}%")


if __name__ == "__main__":
    main()
