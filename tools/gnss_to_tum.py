#!/usr/bin/env python
"""Convert a 4Seasons GNSSPoses.txt ground-truth file to TUM format.

Usage: python tools/gnss_to_tum.py <GNSSPoses.txt> <out.tum>

The output feeds rsvio_tpu.utils.trajectory.evaluate_ate() to compute the
ATE north-star metric on 4Seasons sequences (SURVEY.md §6; the reference
ships no evaluation tooling at all).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from rsvio_tpu.utils.trajectory import gnss_to_tum  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    n = gnss_to_tum(argv[0], argv[1])
    print(f"wrote {n} poses -> {argv[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
