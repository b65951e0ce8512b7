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


def test_fused_bus_matches_split_on_tpu():
    """fused_bus=True (in-kernel v3 fold-dot bus contraction) vs the split
    kernel + XLA einsum path, on real Mosaic (the CPU suite only covers
    interpret mode, which misses layout/precision hazards in the fold
    dots).  fused_bus MUST be the explicit static param — an env-var A/B
    silently reuses the first variant's jit trace (the round-5
    trace-cache trap) and compares the split path against itself."""
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(256, 6, 512, 48000.0, doppler=False, seed=7)
    args = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x, args
    )
    outs = {}
    for fused in (False, True):
        kw = dict(
            speaker_mode=SpeakerMode.SURROUND_71, mix_rate=48000.0,
            frame_count=512, collect_master=True, biquad_method="pallas",
            unit_pitch_aligned=True, fused_bus=fused,
        )
        _, _, master = render_trajectory(*args, **kw)
        outs[fused] = np.asarray(master)
    err = np.abs(outs[False] - outs[True]).max()
    # the variants must actually differ (bf16-split dot ≈ −108 dB, not a
    # bitwise-identical trace reuse) yet stay inside the −80 dBFS budget
    assert 0.0 < err < 1e-4 * max(np.abs(outs[False]).max(), 1.0)


def test_planar_matches_interleaved_on_tpu():
    """fused_mode_a_planar (the path the doppler headline actually runs at
    N=4096: resample-kernel raw planar layout straight into the mix kernel
    with the in-kernel transpose-interleave) vs the interleaved split path,
    on real Mosaic — the CPU suite covers it only in interpret mode, which
    misses layout/precision hazards (VERDICT round-2 weak #3).  N must be a
    1024 multiple (the planar gate; padded small-N was a measured loss) and
    the knobs are explicit static params, never env vars (trace-cache
    trap)."""
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(1024, 4, 512, 48000.0, doppler=True, seed=9)
    args = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x, args
    )
    outs = {}
    for planar in (False, True):
        kw = dict(
            speaker_mode=SpeakerMode.SURROUND_71, mix_rate=48000.0,
            frame_count=512, collect_master=True, biquad_method="pallas",
            resample_gather="kernel", max_pitch=1.4,
            planar=planar, fused_bus=False,
        )
        _, _, master = render_trajectory(*args, **kw)
        outs[planar] = np.asarray(master)
    err = np.abs(outs[False] - outs[True]).max()
    # planar is bit-exact vs the interleaved kernel on the bench device
    # (PERF.md round-5); allow the −80 dBFS budget for other Mosaic
    # versions but require it small
    assert err < 1e-4 * max(np.abs(outs[False]).max(), 1.0)


def test_planar_bus_matches_split_on_tpu():
    """fused_mode_a_bus_planar (planar input + in-kernel v3 fold-dot bus
    contraction) vs the planar split path on real Mosaic."""
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(1024, 4, 512, 48000.0, doppler=True, seed=13)
    args = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x, args
    )
    outs = {}
    for fused in (False, True):
        kw = dict(
            speaker_mode=SpeakerMode.SURROUND_71, mix_rate=48000.0,
            frame_count=512, collect_master=True, biquad_method="pallas",
            resample_gather="kernel", max_pitch=1.4,
            planar=True, fused_bus=fused,
        )
        _, _, master = render_trajectory(*args, **kw)
        outs[fused] = np.asarray(master)
    err = np.abs(outs[False] - outs[True]).max()
    # must differ (fold-dot tail is bf16-split ≈ −96 dB, not a trace
    # reuse) yet stay inside the −80 dBFS budget
    assert 0.0 < err < 1e-4 * max(np.abs(outs[False]).max(), 1.0)


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


def test_wide_window_gather_matches_on_tpu():
    """doppler_wrow=256/512 (fatter HBM gather descriptors, bank-absolute
    alignment) vs the default 128-row window on real Mosaic — guards the
    wide regroup's HBM slicing/layout.  ≤1 f32 ulp through the split2
    selection dot."""
    import numpy as np
    from godot_audio_spatializer_tpu.constants import SpeakerMode
    from godot_audio_spatializer_tpu.engine.offline import render_trajectory
    from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

    args = build_bench_scene(256, 6, 512, 48000.0, doppler=True, seed=5)
    args = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x,
        args,
    )
    outs = {}
    for wrow in (128, 256, 512):
        kw = dict(
            speaker_mode=SpeakerMode.SURROUND_71, mix_rate=48000.0,
            frame_count=512, collect_master=True, biquad_method="pallas",
            resample_gather="kernel", doppler_wrow=wrow,
        )
        _, _, master = render_trajectory(*args, **kw)
        outs[wrow] = np.asarray(master)
    peak = max(np.abs(outs[128]).max(), 1.0)
    for wrow in (256, 512):
        err = np.abs(outs[wrow] - outs[128]).max()
        assert err <= 1e-6 * peak, f"wrow={wrow} deviates {err}"


def test_engine_tpu_matches_cpu_e2e():
    """Full streaming-engine scenario on the TPU backend vs the same run on
    the host CPU backend (which the golden-parity suite validates) — guards
    device-only precision hazards (bf16 single-pass matmuls, device log/exp)
    at the −80 dBFS budget."""
    import numpy as np
    from godot_audio_spatializer_tpu import (
        AudioEngine,
        AudioSpatializer3D,
        AudioStreamPlayerSpatial,
    )
    from godot_audio_spatializer_tpu.constants import DopplerTracking
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
    from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample

    rng = np.random.default_rng(11)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)

    def run(device):
        on_cpu = device.platform == "cpu"
        with jax.default_device(device):
            eng = AudioEngine(
                block_size=512,
                max_sources=8,
                # backend-pick happens off jax.default_backend(), which
                # still reports the TPU under default_device(cpu) — force
                # the portable paths for the CPU twin
                biquad_method="scan" if on_cpu else None,
            )
            if on_cpu:
                eng.resample_gather = "xla"
            eng.add_listener(ListenerDesc())
            sp = AudioSpatializer3D(
                doppler_tracking=DopplerTracking.PHYSICS_STEP,
                attenuation_filter_cutoff_hz=4000.0,
            )
            pl = AudioStreamPlayerSpatial(
                eng, stream=AudioStreamSample(clip, loop=True), spatializer=sp
            )
            x = -15.0
            pl.set_position([x, 0.0, -2.0])
            pl.play()
            eng.physics_step()
            out = []
            for _ in range(8):
                x += 1.5
                pl.set_position([x, 0.0, -2.0])
                eng.physics_step()
                out.append(eng.render_block())
        return np.concatenate(out, axis=1)

    got_tpu = run(jax.devices()[0])
    got_cpu = run(jax.devices("cpu")[0])
    peak = np.abs(got_cpu).max()
    err = np.abs(got_tpu - got_cpu).max()
    assert peak > 1e-3
    assert err <= 1e-4 * max(peak, 1.0), f"TPU deviates {err} vs peak {peak}"
