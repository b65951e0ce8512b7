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


def _time(fn, *args, deadline=None, **kw):
    _sync(fn(*args, **kw))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
        # per-config wall cap (VERDICT r4 item 1): a single config must
        # not starve the rest of the run — reps after the first still
        # yield a valid (if noisier) MIN
        if deadline is not None and time.perf_counter() > deadline:
            break
    return best


# ---------------------------------------------------------------------------
# Roofline model (VERDICT r4 item 5): per-config modeled device traffic and
# MXU FLOPs, so the artifact carries auditable achieved-GB/s / fraction-of-
# measured-peak numbers instead of leaving the device-floor argument in
# PERF.md prose.  The model counts the four HBM passes of the offline mix
# pipeline (PERF.md "Current per-block cost"):
#   1. bank window gather read   N × W × 2ch × 4B   (W = gathered frames
#      per block: F for aligned unit-pitch rows, F·max_pitch + 128-row
#      alignment margin for the resampler window)
#   2. fused kernel read         N × F × 2 × 4
#   3. fused kernel write        N × F × 2 × 4
#   4. bus einsum sig re-read    N × F × 2 × 4  (+ master write, ~0)
# VMEM-resident reuse can legitimately push achieved/STREAM above 1 —
# STREAM is the elementwise HBM copy rate, the kernel pipelines VMEM at
# ~2.4× that (PERF.md: 33.6 MB at ~190 GB/s effective).
# ---------------------------------------------------------------------------

_DEVICE_PROBE = {}


def _device_stream_gbps():
    """Same-process elementwise-stream HBM bandwidth (the STREAM peak the
    roofline fractions are quoted against).  Measured once per run.

    Measurement rules (CLAUDE.md): the K-step scan consumes its carry so
    XLA can't hoist the op out of the loop (each step is one fused
    read+write pass over HBM), K amortizes the tunnel's ~20-60 ms
    per-call sync floor, and the sync transfers a TINY slice — a full
    np.asarray of the 256 MB output rides the ~90 MB/s tunnel and reads
    0.1 GB/s (the round-9 first-cut bug)."""
    if "stream_gbps" in _DEVICE_PROBE:
        return _DEVICE_PROBE["stream_gbps"]
    import jax.numpy as jnp
    from jax import lax

    K = 64
    x = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB

    @jax.jit
    def stream(v):
        def body(c, _):
            return c * 1.000001 + 0.5, ()
        out, _ = lax.scan(body, v, None, length=K)
        return out

    def run():
        _ = np.asarray(stream(x)[0, 0, :1])  # tiny-slice sync

    run()  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    gbps = 2 * K * x.nbytes / best / 1e9  # read + write per scan step
    _DEVICE_PROBE["stream_gbps"] = round(gbps, 1)
    return _DEVICE_PROBE["stream_gbps"]


def _mix_roofline(row, n, frame_count, *, doppler, unit_pitch_aligned,
                  max_pitch, secs_per_block):
    w = frame_count if unit_pitch_aligned else (
        int(frame_count * max_pitch) + 256
    )
    per_block = (n * w * 2 * 4) + 3 * (n * frame_count * 2 * 4)
    gbps = per_block / max(secs_per_block, 1e-9) / 1e9
    stream = _device_stream_gbps()
    row["model_bytes_per_block"] = per_block
    row["achieved_gbps"] = round(gbps, 1)
    row["device_stream_gbps"] = stream
    row["roofline_frac"] = round(gbps / stream, 3)
    return row


def bench_mix(n, speaker_mode, mix_rate, frame_count, *, doppler=True,
              chain=(), use_chain=False, label="", unit_pitch_aligned=False,
              physics_every=1, max_pitch=2.0, bank_dtype=np.float32,
              scan_unroll=1, blocks=None, fused_bus=None, planar=None,
              doppler_wrow=128, deadline=None):
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
    secs = _time(lambda: render_trajectory(*args, **kwargs),
                 deadline=deadline)
    rtf = blocks * frame_count / mix_rate / secs
    row = {"config": label, "sources": n, "rtf": round(rtf, 2),
           "block_ms": round(secs / blocks * 1e3, 4)}
    return _mix_roofline(row, n, frame_count, doppler=doppler,
                         unit_pitch_aligned=unit_pitch_aligned,
                         max_pitch=max_pitch, secs_per_block=secs / blocks)


def bench_streaming(n_sources, deadline=None):
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
    t_c0 = time.perf_counter()
    eng.step()  # trace + compile (the N=4096 program takes minutes cold)
    compile_s = time.perf_counter() - t_c0
    for _ in range(2):
        eng.step()  # warm
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
        if passes and deadline is not None and time.perf_counter() > deadline:
            break  # per-config wall cap; ≥1 pass is a valid marginal
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
            "compile_s": round(compile_s, 1),
            "sync_floor_ms": round(floor_ms, 4),
            "marginal_ms": round(marginal, 4),
            "marginal_ms_passes": [round(m, 3) for m in passes],
            "marginal_realtime": bool(marginal < 512 / 48000.0 * 1e3)}]
    # double-buffered variant: device computes block k while the host does
    # block k+1's work.  On real hardware this removes device compute from
    # the pacing-critical path; on the tunnel it is ~neutral (dispatch
    # itself pays host round trips), measured same-session 80 vs 89 ms —
    # and the deep-async probe showed the tunnel gives NO dispatch/compute
    # overlap at all, so at large N the row is pure compile cost (the
    # N=4096 step_pipelined compile was half of the ~18-min budget hog in
    # BENCH_r04).  Only measured at game scale.
    if n_sources <= 256 and (deadline is None
                             or time.perf_counter() < deadline):
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
    else:
        out.append({"config": f"streaming_step_pipelined_{n_sources}src",
                    "skipped": True,
                    "reason": "pipelined row measured at game scale only "
                              "(tunnel shows no dispatch overlap; second "
                              "large-N compile starved BENCH_r04)"})
    return out


def bench_realtime(n_sources=32, seconds=5.0, deadline=None):
    """Realtime-shell evidence row (VERDICT r4 item 9): drive the native
    ring/pacer loop (engine/realtime.py) against the wall clock for
    ~`seconds`, reporting produced blocks, underruns, max lateness and
    consumer_error.  Gated on the per-step cost: on the bench tunnel the
    ~23-60 ms per-call sync floor exceeds the 10.67 ms block deadline by
    construction, so the row records skipped-with-reason there instead of
    a vacuous underrun count (the functional path itself is pinned by
    tests/test_realtime.py)."""
    from godot_audio_spatializer_tpu import (
        AudioEngine, AudioSpatializer3D, AudioStreamPlayerSpatial,
        AudioStreamSample,
    )
    from godot_audio_spatializer_tpu.engine.realtime import RealtimeRunner
    from godot_audio_spatializer_tpu.engine.scene import ListenerDesc

    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(30000) * 0.3).astype(np.float32)
    eng = AudioEngine(mix_rate=48000.0, block_size=512,
                      max_sources=max(n_sources, 4))
    eng.add_listener(ListenerDesc())
    for i in range(n_sources):
        pl = AudioStreamPlayerSpatial(
            eng, stream=AudioStreamSample(clip, loop=True),
            spatializer=AudioSpatializer3D(),
        )
        pl.set_position([np.cos(i), 0.0, -2.0 - np.sin(i)])
        pl.play()
    block_budget_ms = 512 / 48000.0 * 1e3
    step_ts = []
    for _ in range(5):  # warm (compile) + floor probe
        t0 = time.perf_counter()
        eng.step()
        step_ts.append(time.perf_counter() - t0)
    floor_ms = min(step_ts[1:]) * 1e3
    row = {"config": f"realtime_shell_{n_sources}src",
           "sources": n_sources, "step_floor_ms": round(floor_ms, 2),
           "block_budget_ms": round(block_budget_ms, 2)}
    if floor_ms > block_budget_ms:
        row.update(skipped=True,
                   reason=f"per-step floor {floor_ms:.1f} ms exceeds the "
                          f"{block_budget_ms:.2f} ms block deadline on "
                          "this tunnel — realtime pacing unmeasurable "
                          "here by construction (PERF.md deep-async "
                          "probe); run on directly-attached hardware")
        return row
    runner = RealtimeRunner(eng)
    num_blocks = int(seconds * 48000.0 / 512)
    stats = runner.run(num_blocks, realtime=True)
    row.update(
        blocks_rendered=stats.blocks_rendered,
        blocks_consumed=stats.blocks_consumed,
        underruns=stats.underruns,
        max_lateness_ms=round(stats.max_lateness_ms, 3),
        consumer_error=stats.consumer_error,
        realtime_ok=bool(stats.underruns == 0
                         and stats.consumer_error is None),
    )
    return row


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
    row = {"config": "hrtf_binaural_128tap", "sources": n, "rtf": round(rtf, 2),
           "block_ms": round(secs / BLOCKS * 1e3, 4),
           "hrir_set": "measured_sofa" if measured else "synthetic_kemar"}
    # MXU roofline: the time-domain render is one [N·2ears, taps] ×
    # [taps, F] contraction per block = N·2·taps·F·2 FLOPs (conv_sum_mxu)
    flops = n * 2 * taps * frame_count * 2
    row["model_flops_per_block"] = flops
    row["achieved_tflops"] = round(flops / (secs / BLOCKS) / 1e12, 3)
    return row


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
            "block_ms": round(secs / BLOCKS * 1e3, 4),
            "model_note": "FFT overlap-save decode at K=16 SH channels — "
                          "op-count-bound, not FLOP/byte-bound at this "
                          "size (PERF.md probe_amb_decode), so no "
                          "bytes/FLOPs roofline is modeled"}


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
    # per-config wall cap (VERDICT r4 items 1-2): the budget gate below
    # only checks BETWEEN configs; the deadline threads into each
    # config's measurement loops so one config can't eat the whole run
    # (BENCH_r04: streaming_step_4096src ran ~18 min and starved the
    # five BASELINE configs).  Compile time is not interruptible — the
    # ordering change (BASELINE configs before the big-compile streaming
    # rows) is the hard guarantee.
    cfg_budget_s = float(os.environ.get("GAS_BENCH_CONFIG_BUDGET_S", "300"))
    # persistent XLA compile cache: verified working on the axon backend
    # (second-process compile of the same program is near-instant);
    # compile dominates the big-N configs, so warm workspaces re-bench in
    # a fraction of the cold time
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: cold compiles only
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

    # remaining configs in priority order (VERDICT r4 item 1): the five
    # BASELINE.md configs come FIRST (they are the official perf record —
    # BENCH_r04 skipped all five because the big-compile streaming rows
    # sat ahead of them and ate the budget), then the streaming marginals
    # and scale rows.
    def cfgs(dl):
        # doppler variant of the north star (general resample path) —
        # BASELINE's "4096 moving sources" with the resampler engaged.
        # host-side doppler bound for the window size: the scene's sources
        # orbit at ≤ 2 rad/s × 40 m = 80 m/s toward a static listener →
        # pitch ≤ 343/(343−80) = 1.305 < 1.4; a tighter static max_pitch
        # shrinks the resample window without ever clamping a legit pitch.
        # scan_unroll=2: XLA overlaps block k's mix kernel with block
        # k+1's window gather (−0.6 ms/block measured)
        yield "north_star_4096src_doppler", lambda: bench_mix(
            4096, SpeakerMode.SURROUND_71, 48000.0, 512, doppler=True,
            label="north_star_4096src_doppler", max_pitch=1.4,
            scan_unroll=2, deadline=dl())
        # config 1: 1 mono source → stereo pan + inverse distance, 44.1 kHz
        yield "c1_single_source_stereo", lambda: bench_mix(
            1, SpeakerMode.STEREO, 44100.0, 512, doppler=False,
            unit_pitch_aligned=True, label="c1_single_source_stereo",
            deadline=dl())
        # config 2: 64 moving sources → 5.1, doppler + gain ramps
        yield "c2_64src_5.1_doppler", lambda: bench_mix(
            64, SpeakerMode.SURROUND_51, 44100.0, 512,
            label="c2_64src_5.1_doppler", max_pitch=1.4, scan_unroll=2,
            deadline=dl())
        # config 3: per-source lowpass occlusion chain
        yield "c3_1024src_occlusion_chain", lambda: bench_mix(
            1024, SpeakerMode.STEREO, 48000.0, 512, doppler=False,
            unit_pitch_aligned=True,
            chain=(AudioEffectFilter(FilterMode.LOWPASS, cutoff_hz=1500.0),),
            use_chain=True, label="c3_1024src_occlusion_chain",
            deadline=dl())
        # config 4: HRTF binaural, 128-tap HRIRs
        yield "hrtf_binaural_128tap", lambda: bench_hrtf(1024, 48000.0, 512)
        # config 5: 4096 sources, ambisonic order-3 encode + binaural decode
        yield "ambisonic_o3_binaural", lambda: bench_ambisonic(
            4096, 48000.0, 512)
        # streaming latency: the fused single-dispatch engine step, at game
        # scale (32) and at the north-star source count (4096 — the full
        # concurrent-source claim on the INTERACTIVE path)
        yield "streaming_step_32src", lambda: bench_streaming(
            32, deadline=dl())
        # realtime shell: native ring/pacer against the wall clock
        # (skips-with-reason where the tunnel floor exceeds the deadline)
        yield "realtime_shell_32src", lambda: bench_realtime(
            32, deadline=dl())
        # 47 Hz physics variant (games commonly tick physics at 30-60 Hz;
        # the reference's parameters are per-tick snapshots either way)
        yield "north_star_4096src_physics47Hz", lambda: bench_mix(
            4096, SpeakerMode.SURROUND_71, 48000.0, 512,
            doppler=False, unit_pitch_aligned=True, physics_every=2,
            scan_unroll=2, label="north_star_4096src_physics47Hz",
            deadline=dl())
        # scale demonstration: 4× the north-star source count; smaller scan
        # bounds the vmapped Stage-A prepass memory at ~0.6 GB
        yield "scale_16384src_7.1_48k", lambda: bench_mix(
            16384, SpeakerMode.SURROUND_71, 48000.0, 512,
            doppler=False, unit_pitch_aligned=True, scan_unroll=2,
            label="scale_16384src_7.1_48k", blocks=16 if QUICK else 192,
            deadline=dl())
        # LAST: the big-compile interactive row (~9+ min trace+compile at
        # N=4096 on the tunnel, measured round 9 — never allowed to starve
        # the BASELINE configs again)
        if not QUICK:
            yield "streaming_step_4096src", lambda: bench_streaming(
                4096, deadline=dl())

    def _deadline():
        return time.perf_counter() + cfg_budget_s

    for label, thunk in cfgs(_deadline):
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
