"""One-time vendoring of the Scotty test fixtures into the repo.

The suite's strongest cross-implementation oracle — the tick-identical
200-resolve MPC iteration trace (tests/test_bicycle.py) — previously
read the reference artifacts from an absolute /root/reference path and
silently degraded to a loose behavioral envelope when that tree was
absent. This script converts the two reference JSON fixtures
(format documented at reference test/test_utils.cpp:240-289 for
scotty.json; the artifact is written by test/bicycle_test.cpp:344-359)
into compact binary .npz archives under data/ so the strict branch runs
self-contained. Run once with the reference tree mounted:

    python scripts/vendor_scotty.py
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "data")
REF = "/root/reference/test"


def convert(name: str) -> None:
    with open(os.path.join(REF, name + ".json")) as fh:
        d = json.load(fh)
    arrays = {}
    for k, v in d.items():
        a = np.asarray(v)
        arrays[k] = a
    out = os.path.join(DATA, name + ".npz")
    np.savez_compressed(out, **arrays)
    kb = os.path.getsize(out) / 1024
    print(f"{out}: {sorted(arrays)} ({kb:.1f} KiB)")


def main() -> None:
    os.makedirs(DATA, exist_ok=True)
    convert("scotty")
    convert("scotty_mpc")


if __name__ == "__main__":
    main()
