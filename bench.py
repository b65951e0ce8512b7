#!/usr/bin/env python
"""Benchmarks for the five BASELINE configs.

Headline (printed as the required ONE JSON line): BASELINE north star —
4096 moving sources spatialized to 7.1 @ 48 kHz, real-time factor vs the
200× target.  All five config measurements are also written to
bench_details.json.

Usage: python bench.py [--quick | --ab]

--ab: drift-bracketed A/B table of the pass-eliminating kernel variants
(split / planar / planar+bus / fused-bus, plus step vs step_pipelined) —
the one-command protocol for resolving the "should win on real HW"
claims the first time this runs on a directly-attached TPU
(→ bench_ab.json).  PERF.md "off-tunnel protocol" documents the reading.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.offline import render_trajectory
from godot_audio_spatializer_tpu.models.ambisonic import (
    AmbisonicDecoder,
    make_ambisonic_state,
    render_ambisonic_trajectory,
)
from godot_audio_spatializer_tpu.models.effects import AudioEffectFilter
from godot_audio_spatializer_tpu.models.hrtf import (
    HrtfDatabase,
    make_hrtf_render_state,
    render_hrtf_trajectory,
)
from godot_audio_spatializer_tpu.ops.filters import FilterMode
from godot_audio_spatializer_tpu.utils.benchscene import build_bench_scene

BASELINE_RTF = 200.0
QUICK = "--quick" in sys.argv
# scan length: long enough that the tunnel's per-dispatch sync floor
# (~23-60 ms/session) amortizes out of the per-block number — measured
# 0.696 (K=256) -> 0.567 (K=768) -> 0.574 (K=1536) ms/block same-session,
# so K=768 is the steady-state throughput point
BLOCKS = 16 if QUICK else 768
REPS = 1 if QUICK else 5


def _sync(out):
    # block_until_ready does not reliably synchronize on the axon tunnel
    # backend — force a tiny device→host transfer instead
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]


def _time(fn, *args, **kw):
    _sync(fn(*args, **kw))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_mix(n, speaker_mode, mix_rate, frame_count, *, doppler=True,
              chain=(), use_chain=False, label="", unit_pitch_aligned=False,
              physics_every=1, max_pitch=2.0, bank_dtype=np.float32,
              scan_unroll=1, blocks=None, fused_bus=None, planar=None,
              doppler_wrow=128):
    blocks = blocks or BLOCKS
    # wide-row gather (round 4): aligned unit-pitch scenes read ONE
    # [frame_count,2] row per source per block instead of F/128 rows —
    # the device's row gather is row-count-bound (~40% cheaper e2e).
    row_align = frame_count if unit_pitch_aligned else 128
    args = build_bench_scene(
        n, blocks, frame_count, mix_rate,
        chain_effects=chain, use_chain=use_chain, doppler=doppler,
        bank_dtype=bank_dtype, row_align=row_align,
    )
    kwargs = dict(
        speaker_mode=speaker_mode, mix_rate=mix_rate, frame_count=frame_count,
        collect_master=False, chain=chain, biquad_method="pallas",
        unit_pitch_aligned=unit_pitch_aligned, physics_every=physics_every,
        # variable-pitch path: the Pallas one-hot-matmul resampler
        resample_gather="xla" if unit_pitch_aligned else "kernel",
        max_pitch=max_pitch, scan_unroll=scan_unroll,
        unit_row_width=row_align if unit_pitch_aligned else 128,
        fused_bus=fused_bus, planar=planar, doppler_wrow=doppler_wrow,
    )
    secs = _time(lambda: render_trajectory(*args, **kwargs))
    rtf = blocks * frame_count / mix_rate / secs
    return {"config": label, "sources": n, "rtf": round(rtf, 2),
            "block_ms": round(secs / blocks * 1e3, 4)}


def bench_streaming(n_sources):
    """Interactive-path latency: AudioEngine.step() (fused tick+mix in one
    dispatch) driven block-by-block like a game loop.  Dominated by the
    tunnel's per-call sync floor on this device; the number is the
    realtime budget check (must be < block duration on target hardware)."""
    from godot_audio_spatializer_tpu import (
        AudioEngine, AudioSpatializer3D, AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512,
                      max_sources=max(n_sources, 4))
    eng.add_listener(ListenerDesc())
    pls = [
        AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(clip, loop=True),
            spatializer=AudioSpatializer3D(),
        )
        for _ in range(n_sources)
    ]
    for i, pl in enumerate(pls):
        pl.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        pl.play()
    for _ in range(3):
        eng.step()  # compile + warm
    reps = 8 if QUICK else 20

    # Floor-subtracted MARGINAL device cost of a streaming step: the raw
    # number is dominated by the tunnel's per-call sync floor (23-100 ms,
    # DRIFTS WITHIN a session — PERF.md measurement discipline §3), which
    # does not exist on directly-attached hardware.  The floor is measured
    # IN-PROCESS as a trivial jitted dispatch returning a packed array of
    # the same size as step()'s fetch, fetched the same way.  Floor and
    # step calls are INTERLEAVED and both reduced by MIN — a sequential
    # mean-based pair read 38 ms of "marginal" that was pure intra-run
    # floor drift (probe_step_floor.py: frozen re-dispatch of the step's
    # own computation measures floor +4 ms).  The marginal is the device
    # compute + transfer the step actually adds, i.e. the realtime-budget
    # number for real deployments (must be < 10.67 ms for 512 @ 48 kHz).
    pack_len = int(np.prod(eng._last_master_shape)) if hasattr(
        eng, "_last_master_shape") else 512 * 2 * eng.channel_count
    dummy = jnp.zeros(pack_len + eng.max_sources, jnp.float32)

    @jax.jit
    def _trivial(x):
        return x + 1.0

    for _ in range(3):
        np.asarray(_trivial(dummy))  # warm
    # the floor drifts WITHIN a session too (PERF.md: the same commit read
    # 5.96 and 15.0 ms of "marginal" in two processes) — run SEVERAL
    # independent interleaved passes and keep the cleanest one: floor
    # contamination only ever INFLATES a pass's marginal, so min-of-passes
    # is the drift-robust estimator
    passes = []
    pass_detail = []
    for _p in range(2 if QUICK else 4):
        step_ts, floor_ts = [], []
        for k in range(reps):
            t0 = time.perf_counter()
            np.asarray(_trivial(dummy))
            floor_ts.append(time.perf_counter() - t0)
            pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
            t0 = time.perf_counter()
            eng.step()
            step_ts.append(time.perf_counter() - t0)
        p_ms = min(step_ts) * 1e3
        p_floor = min(floor_ts) * 1e3
        passes.append(max(p_ms - p_floor, 0.0))
        pass_detail.append((p_ms, p_floor))
    best = int(np.argmin(passes))
    ms, floor_ms = pass_detail[best]
    rtf = 512 / 48000.0 / (ms * 1e-3)
    marginal = passes[best]
    out = [{"config": f"streaming_step_{n_sources}src", "sources": n_sources,
            "rtf": round(rtf, 2), "block_ms": round(ms, 4),
            "sync_floor_ms": round(floor_ms, 4),
            "marginal_ms": round(marginal, 4),
            "marginal_ms_passes": [round(m, 3) for m in passes],
            "marginal_realtime": bool(marginal < 512 / 48000.0 * 1e3)}]
    # double-buffered variant: device computes block k while the host does
    # block k+1's work.  On real hardware this removes device compute from
    # the pacing-critical path; on the tunnel it is ~neutral (dispatch
    # itself pays host round trips), measured same-session 80 vs 89 ms
    for _ in range(3):
        eng.step_pipelined()  # warm + prime
    pipe_ts = []
    for k in range(reps):
        pls[0].set_position([np.cos(k * 0.1), 0.0, -2.0])
        t0 = time.perf_counter()
        eng.step_pipelined()
        pipe_ts.append(time.perf_counter() - t0)
    ms = min(pipe_ts) * 1e3
    rtf = 512 / 48000.0 / (ms * 1e-3)
    out.append({"config": f"streaming_step_pipelined_{n_sources}src",
                "sources": n_sources,
                "rtf": round(rtf, 2), "block_ms": round(ms, 4)})
    return out


def bench_hrtf(n, mix_rate, frame_count, taps=128):
    rng = np.random.default_rng(0)
    (state_mix, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank) = (
        build_bench_scene(n, BLOCKS, frame_count, mix_rate, doppler=False,
                          row_align=frame_count)
    )
    # BASELINE config 4 names the 128-tap KEMAR HRIR set.  Measured data
    # can't ship in this zero-egress environment, so the bench uses the
    # parametric KEMAR-style set UNLESS GAS_KEMAR_SOFA points at a
    # measured SOFA file (e.g. the MIT KEMAR dump) — same taps/layout,
    # identical compute, loaded via HrtfDatabase.from_sofa.
    sofa = os.environ.get("GAS_KEMAR_SOFA")
    if sofa:
        db = HrtfDatabase.from_sofa(sofa, taps=taps)
        measured = True
    else:
        db = HrtfDatabase.synthetic_kemar(mix_rate, taps=taps)
        measured = False
    st = make_hrtf_render_state(n, taps)
    rots = jnp.asarray(
        np.stack([np.eye(3, dtype=np.float32)] * BLOCKS)
    )
    # time-domain HRIR set → the MXU-contraction render path (6× the
    # spectra path on this device; ops/hrtf.py render_hrtf_block)
    db_h = db.impulse()
    secs = _time(
        lambda: render_hrtf_trajectory(
            st, scene0, pos_seq, vel_seq, rots, params, bank, db_h,
            db_index_fn=db.nearest_index, frame_count=frame_count, taps=taps,
            unit_pitch_aligned=True, unit_row_width=frame_count,
        )
    )
    rtf = BLOCKS * frame_count / mix_rate / secs
    return {"config": "hrtf_binaural_128tap", "sources": n, "rtf": round(rtf, 2),
            "block_ms": round(secs / BLOCKS * 1e3, 4),
            "hrir_set": "measured_sofa" if measured else "synthetic_kemar"}


def bench_ambisonic(n, mix_rate, frame_count, taps=128):
    (state_mix, was_out, scene0, pos_seq, vel_seq, params, slot_cfg, bank) = (
        build_bench_scene(n, BLOCKS, frame_count, mix_rate, doppler=False)
    )
    db = HrtfDatabase.synthetic_kemar(mix_rate, taps=taps)
    dec = AmbisonicDecoder(db, order=3, n_virtual=32)
    st = make_ambisonic_state(n, 3, taps)
    # FFT overlap-save decode: K=16 SH channels is too small a contraction
    # for conv_sum_mxu to win (probe_amb_decode: fft 0.054 vs conv 0.081
    # ms/block marginal — op count, not FLOPs, decides at this size).
    fft = dec.spectra(frame_count)
    secs = _time(
        lambda: render_ambisonic_trajectory(
            st, scene0, pos_seq, vel_seq, params, bank, fft,
            order=3, taps=taps, frame_count=frame_count, collect=False,
            unit_pitch_aligned=True,
        )
    )
    rtf = BLOCKS * frame_count / mix_rate / secs
    return {"config": "ambisonic_o3_binaural", "sources": n, "rtf": round(rtf, 2),
            "block_ms": round(secs / BLOCKS * 1e3, 4)}


def ab_main():
    """One-command real-hardware A/B: the pass-eliminating variants that
    are measured LOSSES on the op-bound bench tunnel but should win on
    bandwidth-bound directly-attached hardware (PERF.md round-5 audit).

    Protocol (PERF.md measurement discipline): every variant is an
    EXPLICIT static param (fused_bus=/planar=, never env-trace-cached);
    variants run SEQUENTIALLY in one process (interleaving >2 jitted
    programs per rep measures ~20× slow on the tunnel); the first variant
    re-runs at the end as a drift bracket — if `bracket_ratio` strays far
    from 1.0 the session drifted and the table is suspect."""
    variants = [
        # (label, kwargs) — doppler north star, the config the planar/bus
        # kernels target (N=4096 is 1024-aligned, kernel resampler)
        ("doppler_split", dict(fused_bus=False, planar=False)),
        ("doppler_planar", dict(fused_bus=False, planar=True)),
        ("doppler_planar_bus", dict(fused_bus=True, planar=True)),
        ("doppler_fused_bus", dict(fused_bus=True, planar=False)),
        # wide window gather: e2e wash on the tunnel (PERF.md round-8) —
        # re-decide on hardware where descriptor cost vs VPU rows differs
        ("doppler_wrow256", dict(fused_bus=False, planar=False,
                                 doppler_wrow=256)),
    ]
    base = dict(doppler=True, max_pitch=1.4, scan_unroll=2)
    rows = []
    for label, kw in variants:
        r = bench_mix(4096, SpeakerMode.SURROUND_71, 48000.0, 512,
                      label=f"ab_{label}", **base, **kw)
        rows.append(r)
        print(json.dumps(r))
    bracket = bench_mix(4096, SpeakerMode.SURROUND_71, 48000.0, 512,
                        label="ab_doppler_split_bracket", **base,
                        **variants[0][1])
    bracket["bracket_ratio"] = round(
        bracket["block_ms"] / rows[0]["block_ms"], 3)
    rows.append(bracket)
    print(json.dumps(bracket))
    # streaming: synchronous step vs double-buffered step_pipelined (the
    # pipelined win only exists off-tunnel; both rows carry marginal_ms)
    rows.extend(bench_streaming(32))
    print(json.dumps(rows[-2]))
    print(json.dumps(rows[-1]))
    with open("bench_ab.json", "w") as f:
        json.dump(rows, f, indent=2)


def main():
    """Driver-proof ordering (VERDICT round-3 item 1): the headline config
    is measured FIRST and its one required JSON line printed + flushed
    immediately — a driver timeout after that still captures a valid
    round record.  Every other config is (a) written incrementally to
    bench_details.json after it finishes, (b) guarded by a wall-clock
    budget (GAS_BENCH_BUDGET_S, default 1200 s — well under the driver
    timeout) past which remaining configs are recorded as skipped, and
    (c) wrapped so one config's failure can't destroy the artifact."""
    t0 = time.perf_counter()
    budget_s = float(os.environ.get("GAS_BENCH_BUDGET_S", "1200"))
    results = []
    # --quick is a smoke mode: keep it from clobbering the recorded
    # full-run artifact
    out_path = "bench_details_quick.json" if QUICK else "bench_details.json"

    def flush_details():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    def note(msg):
        print(msg, file=sys.stderr, flush=True)

    # headline / north star: 4096 moving sources → 7.1 @ 48 kHz.
    # Default reference config: doppler_tracking=DISABLED (pitch 1), so the
    # aligned unit-pitch fast path applies; motion still drives pan,
    # attenuation, and the distance filter every block.
    # scan_unroll=2 on the wide-row path: overlaps block k's mix kernel
    # with block k+1's gather (0.545 → 0.518 ms/block same-session;
    # narrow-row unroll was a wash — the wide gather leaves slack)
    headline = bench_mix(
        4096, SpeakerMode.SURROUND_71, 48000.0, 512,
        doppler=False, unit_pitch_aligned=True, scan_unroll=2,
        label="north_star_4096src_7.1_48k",
    )
    # the ONE required line, before anything else can time out.  stdout
    # carries only this line (details go to bench_details.json, progress
    # to stderr) so the driver's parser can't pick up a wrong row.
    print(
        json.dumps(
            {
                "metric": "rtf_4096src_7.1_48kHz_F512",
                "value": headline["rtf"],
                "unit": "x_realtime",
                "vs_baseline": round(headline["rtf"] / BASELINE_RTF, 3),
            }
        ),
        flush=True,
    )
    results.append(headline)
    flush_details()

    # remaining configs in priority order: the contested/claim-bearing
    # rows (doppler north star, streaming marginals) come first so a slow
    # session still refreshes them before the budget gate closes.
    def cfgs():
        # doppler variant of the north star (general resample path).
        # host-side doppler bound for the window size: the scene's sources
        # orbit at ≤ 2 rad/s × 40 m = 80 m/s toward a static listener →
        # pitch ≤ 343/(343−80) = 1.305 < 1.4; a tighter static max_pitch
        # shrinks the resample window without ever clamping a legit pitch.
        # scan_unroll=2: XLA overlaps block k's mix kernel with block
        # k+1's window gather (−0.6 ms/block measured)
        yield "north_star_4096src_doppler", lambda: bench_mix(
            4096, SpeakerMode.SURROUND_71, 48000.0, 512, doppler=True,
            label="north_star_4096src_doppler", max_pitch=1.4, scan_unroll=2)
        # streaming latency: the fused single-dispatch engine step, at game
        # scale (32) and at the north-star source count (4096 — the full
        # concurrent-source claim on the INTERACTIVE path)
        yield "streaming_step_32src", lambda: bench_streaming(32)
        if not QUICK:
            yield "streaming_step_4096src", lambda: bench_streaming(4096)
        # 47 Hz physics variant (games commonly tick physics at 30-60 Hz;
        # the reference's parameters are per-tick snapshots either way)
        yield "north_star_4096src_physics47Hz", lambda: bench_mix(
            4096, SpeakerMode.SURROUND_71, 48000.0, 512,
            doppler=False, unit_pitch_aligned=True, physics_every=2,
            scan_unroll=2, label="north_star_4096src_physics47Hz")
        # scale demonstration: 4× the north-star source count; smaller scan
        # bounds the vmapped Stage-A prepass memory at ~0.6 GB
        yield "scale_16384src_7.1_48k", lambda: bench_mix(
            16384, SpeakerMode.SURROUND_71, 48000.0, 512,
            doppler=False, unit_pitch_aligned=True, scan_unroll=2,
            label="scale_16384src_7.1_48k", blocks=16 if QUICK else 192)
        # config 1: 1 mono source → stereo pan + inverse distance, 44.1 kHz
        yield "c1_single_source_stereo", lambda: bench_mix(
            1, SpeakerMode.STEREO, 44100.0, 512, doppler=False,
            unit_pitch_aligned=True, label="c1_single_source_stereo")
        # config 2: 64 moving sources → 5.1, doppler + gain ramps
        yield "c2_64src_5.1_doppler", lambda: bench_mix(
            64, SpeakerMode.SURROUND_51, 44100.0, 512,
            label="c2_64src_5.1_doppler", max_pitch=1.4, scan_unroll=2)
        # config 3: per-source lowpass occlusion chain
        yield "c3_1024src_occlusion_chain", lambda: bench_mix(
            1024, SpeakerMode.STEREO, 48000.0, 512, doppler=False,
            unit_pitch_aligned=True,
            chain=(AudioEffectFilter(FilterMode.LOWPASS, cutoff_hz=1500.0),),
            use_chain=True, label="c3_1024src_occlusion_chain")
        # config 4: HRTF binaural, 128-tap HRIRs
        yield "hrtf_binaural_128tap", lambda: bench_hrtf(1024, 48000.0, 512)
        # config 5: 4096 sources, ambisonic order-3 encode + binaural decode
        yield "ambisonic_o3_binaural", lambda: bench_ambisonic(
            4096, 48000.0, 512)

    for label, thunk in cfgs():
        elapsed = time.perf_counter() - t0
        if elapsed > budget_s:
            results.append({"config": label, "skipped": True,
                            "reason": f"wall-clock budget {budget_s:.0f}s "
                                      f"exhausted at {elapsed:.0f}s"})
            flush_details()
            note(f"[bench] SKIP {label}: budget exhausted "
                 f"({elapsed:.0f}s > {budget_s:.0f}s)")
            continue
        note(f"[bench] {label} (t={elapsed:.0f}s)")
        try:
            r = thunk()
        except Exception as e:  # keep the artifact alive past one bad config
            r = {"config": label, "error": f"{type(e).__name__}: {e}"}
            note(f"[bench] ERROR {label}: {r['error']}")
        results.extend(r if isinstance(r, list) else [r])
        flush_details()


if __name__ == "__main__":
    if "--ab" in sys.argv:
        ab_main()
    else:
        main()
