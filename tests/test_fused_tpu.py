"""TPU-only parity tests for the fused Pallas mix kernel.

Skipped on the CPU test mesh (conftest forces cpu); run manually on TPU:
    JAX_PLATFORMS='' python -m pytest tests/test_fused_tpu.py --no-header
The fused path was verified bit-exact vs the lax.scan path on the bench
device (see PERF.md); this test re-checks it wherever a TPU is present.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="requires a TPU backend"
)


def test_fused_mode_a_matches_scan():
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(256, 8, 512, 48000.0, doppler=False, seed=3)
    args = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x, args
    )
    outs = {}
    for method in ("scan", "pallas"):
        kw = dict(
            speaker_mode=SpeakerMode.SURROUND_71, mix_rate=48000.0,
            frame_count=512, collect_master=True, biquad_method=method,
            unit_pitch_aligned=True,
        )
        _, _, master = render_trajectory(*args, **kw)
        outs[method] = np.asarray(master)
    err = np.abs(outs["scan"] - outs["pallas"]).max()
    assert err < 1e-4 * max(np.abs(outs["scan"]).max(), 1.0)


def test_kernel_resampler_matches_xla_on_tpu():
    """Doppler north star: Pallas resampler vs XLA gather through the full
    offline engine on real TPU."""
    import numpy as np
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(256, 6, 512, 48000.0, doppler=True, seed=5)
    args = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x, args
    )
    outs = {}
    for method in ("xla", "kernel"):
        kw = dict(
            speaker_mode=SpeakerMode.SURROUND_71, mix_rate=48000.0,
            frame_count=512, collect_master=True, biquad_method="pallas",
            resample_gather=method,
        )
        _, _, master = render_trajectory(*args, **kw)
        outs[method] = np.asarray(master)
    err = np.abs(outs["xla"] - outs["kernel"]).max()
    assert err < 1e-5 * max(np.abs(outs["xla"]).max(), 1.0)
