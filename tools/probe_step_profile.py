#!/usr/bin/env python
"""cProfile attribution of the streaming step()'s host-side time at a
given source count (companion to probe_step_split.py — that one gives
the floor-subtracted totals, this one names the host functions).

Usage: python tools/probe_step_profile.py [N_SOURCES] [REPS]
"""
import cProfile
import pstats
import sys

import numpy as np

sys.path.insert(0, ".")
from tools.probe_step_split import build  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def main():
    eng, pls = build(N)
    for _ in range(3):
        eng.step()

    def run():
        for k in range(REPS):
            pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
            eng.step()

    prof = cProfile.Profile()
    prof.enable()
    run()
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
