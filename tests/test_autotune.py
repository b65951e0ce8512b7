"""Autotune cache: persistence round-trip + kernel knob resolution."""

import json

import numpy as np
import jax.numpy as jnp

from godot_audio_spatializer_tpu.utils import autotune
from godot_audio_spatializer_tpu.ops.resample import (
    ROW, build_bank, resample_block, window_rows,
)


def test_cache_roundtrip_and_kernel_resolution(tmp_path, monkeypatch):
    monkeypatch.setattr(autotune, "CACHE_PATH", str(tmp_path / "tune.json"))
    monkeypatch.setattr(autotune, "_cache", None)

    F, max_pitch = 256, 1.4
    R = window_rows(F, max_pitch)
    autotune._store(F, R, {"s_blk": 8, "fchunk": 128, "precision": "split2"})

    monkeypatch.setattr(autotune, "_cache", None)  # force re-read from disk
    tuned = autotune.lookup(F, R)
    assert tuned == {"s_blk": 8, "fchunk": 128, "precision": "split2"}
    with open(tmp_path / "tune.json") as f:
        assert len(json.load(f)) == 1

    # the kernel path resolves the tuned knobs (s_blk=8 pads N=4 lanes) and
    # still matches the XLA path bit-for-bit on cursor math
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal((1024, 2)) * 0.5).astype(np.float32)
    bank, bases = build_bank([(clip, True)], F, max_pitch)
    n = 4
    base = jnp.full(n, bases[0], jnp.int32)
    length = jnp.full(n, clip.shape[0], jnp.int32)
    loop = jnp.ones(n, bool)
    cur = jnp.asarray([0, 128, 256, 384], jnp.int32)
    frac = jnp.zeros(n, jnp.int32)
    pitch = jnp.full(n, int(1.2 * 65536), jnp.int32)

    out = {}
    for method in ("kernel", "xla"):
        frames, mixed, ni, nf = resample_block(
            jnp.asarray(bank), base, length, loop, cur, frac, pitch, F,
            max_pitch=max_pitch, gather_method=method,
        )
        out[method] = (np.asarray(frames), np.asarray(ni), np.asarray(nf))
    np.testing.assert_array_equal(out["kernel"][1], out["xla"][1])
    np.testing.assert_array_equal(out["kernel"][2], out["xla"][2])
    np.testing.assert_allclose(out["kernel"][0], out["xla"][0], atol=2e-5)
