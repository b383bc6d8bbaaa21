"""Regenerate examples/gross_code_study.json on the current decode stack.

The round-2 artifact recorded 959 shots/s for the [[144,12]] gross-code
circuit-level decode — the pre-slot-BP, pre-Pallas pipeline. The canon
bench has since recorded 67k (r3) and 153k (r4) shots/s for the same
workload, leaving the examples/ record contradicting BENCH_CANON.json
(VERDICT r3 weak #5 / next #6). This driver re-measures the study's two
physical-error-rate points through the exact e2e path `bench.py --bb`
times (sample + tiered slot-BP + damped min-sum retry + host OSD-0 on
the non-converged residue, failure check per observable) and rewrites
the artifact with counts, Wilson CIs, and a provenance stamp.

Reference role: LDPC decoding spec at
/root/reference/src/qpu_simulator/architecture/qec/decoders.py:9-11.
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    import jax

    from bench import main_bb

    small = "--small" in sys.argv
    shots = (1 << 12) if small else (1 << 16)
    reps = 2 if small else 6
    rows = {}
    for i, p in enumerate((1e-3, 2e-3)):
        rows[f"p={p}"] = main_bb(rounds=3, p=p, shots=shots,
                                 seed=11 + i, reps=reps)
    from noisyquantumsimulator_tpu.utils.observability import \
        provenance_stamp
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gross_code_study.json")
    with open(out, "w") as f:
        json.dump({**provenance_stamp(),
                   "device": str(jax.devices()[0]),
                   "code": "[[144,12]]", "rounds": 3, **rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
