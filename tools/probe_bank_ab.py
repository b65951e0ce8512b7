#!/usr/bin/env python
"""Same-session A/B: f32 vs int16 sample bank on the two headline configs.

Run AFTER kernel-precision tuning (uses the engine defaults + bench paths).
"""
import sys

import numpy as np

sys.argv = [sys.argv[0], "--quick"] if "--quick" in sys.argv else [sys.argv[0]]
import bench
from godot_audio_spatializer_tpu.constants import SpeakerMode


def main():
    for dt, name in ((np.float32, "f32"), (np.int16, "int16")):
        r = bench.bench_mix(
            4096, SpeakerMode.SURROUND_71, 48000.0, 512,
            doppler=False, unit_pitch_aligned=True,
            label=f"north_star_{name}", bank_dtype=dt,
        )
        print(r)
        r = bench.bench_mix(
            4096, SpeakerMode.SURROUND_71, 48000.0, 512, doppler=True,
            label=f"doppler_{name}", max_pitch=1.4, bank_dtype=dt,
        )
        print(r)


if __name__ == "__main__":
    main()
