"""Randomized long-run lifecycle stress: interleaved plays, stops, pauses,
motion, and parameter churn across many blocks — engine vs golden.

This is the adversarial version of the e2e tests: the event schedule is
random (seeded), so it exercises combinations no hand-written scenario
covers (stop during fade, play into a half-decayed filter lane, pause over
a parameter change, polyphony churn...).
"""

import numpy as np
import pytest

from godot_audio_spatializer_tpu.constants import SpeakerMode
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import AudioStreamSample
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D
from godot_audio_spatializer_tpu.golden import reference as g

MIX_RATE = 44100.0
F = 512
DB80 = 1e-4
# long enough to hit the proxy-pause lifetime cases (play-after-stop under
# pause diverged at block 31/64 in the round-3 fuzz that found them; a
# 120-block 5-seed sweep runs clean)
N_BLOCKS = 80


class GoldenPlayerSim:
    """Scripted golden twin of one engine player."""

    def __init__(self, server, data, cfg, loop):
        self.server = server
        self.data = data
        self.cfg = cfg
        self.loop = loop
        self.inst = g.GoldenSpatializerInstance(cfg, SpeakerMode.STEREO, MIX_RATE)
        self.was_out = False
        self.registered = False
        self.paused = False
        self.pos = np.zeros(3)
        self.voices = []  # non-stopped playback nodes, oldest first

    def tick(self, events):
        # order matches the engine physics step: params update first, then
        # play/stop events (reference cpp:74-93)
        t = g.Transform3D.looking(self.pos.astype(np.float64))
        params, self.was_out = g.calculate_spatialization(
            self.cfg, t, np.zeros(3), 0.0, 3.0, 1.0, "Master",
            [g.Listener()], [], SpeakerMode.STEREO, self.was_out,
        )
        self.inst.set_spatializer_parameters(params)

        # GC finished playbacks first (engine reads device active flags)
        self.voices = [p for p in self.voices if p.active]

        for ev in events:
            if ev == "play":
                node = self.inst.start_playback_stream(
                    g.BufferStream(self.data, loop=self.loop)
                )
                self.voices.append(node)
                if not self.registered:
                    self.server.start_playback_stream(
                        self.inst, 0, g.get_bus_map(params, 0, False)
                    )
                    self.registered = True
            elif ev == "stop":
                for p in list(self.voices):
                    self.inst.stop_playback_stream(p)
                self.voices.clear()
            elif ev == "pause":
                self.paused = True
                self.server.set_playback_paused(self.inst, True)
            elif ev == "unpause":
                self.paused = False
                self.server.set_playback_paused(self.inst, False)
        # polyphony limit 2: trim oldest (reference ensure_playback_limit)
        while len(self.voices) > 2:
            node = self.voices.pop(0)
            self.inst.stop_playback_stream(node)

        if self.registered:
            self.server.set_playback_bus_volumes_linear(
                self.inst, 0, g.get_bus_map(params, 0, False)
            )


@pytest.mark.parametrize("seed", [100, 101])
def test_randomized_lifecycle(seed):
    rng = np.random.default_rng(seed)
    n_players = 3
    clips = [
        (rng.standard_normal(int(rng.integers(2000, 30000))) * 0.3).astype(np.float32)
        for _ in range(n_players)
    ]
    loops = [bool(rng.random() < 0.5) for _ in range(n_players)]
    trajectories = [
        [np.array([rng.uniform(-6, 6), rng.uniform(-1, 1), rng.uniform(-6, -1)])
         for _ in range(N_BLOCKS)]
        for _ in range(n_players)
    ]
    # event schedule per block per player
    schedule = []
    for b in range(N_BLOCKS):
        evs = []
        for pi in range(n_players):
            e = []
            r = rng.random()
            if b == 0 or r < 0.15:
                e.append("play")
            elif r < 0.22:
                e.append("stop")
            elif r < 0.27:
                e.append("pause")
            elif r < 0.32:
                e.append("unpause")
            evs.append(e)
        schedule.append(evs)

    cfg = g.Spatializer3DConfigG()

    # ---- golden ----
    server = g.GoldenAudioServer(SpeakerMode.STEREO, MIX_RATE, F)
    sims = [GoldenPlayerSim(server, clips[i], cfg, loops[i]) for i in range(n_players)]
    ref_blocks = []
    for b in range(N_BLOCKS):
        for pi, sim in enumerate(sims):
            sim.pos = trajectories[pi][b]
            sim.tick(schedule[b][pi])
        ref_blocks.append(server.mix_block())
        # proxy teardown when the playback list empties during the mix
        # (reference _manage_playback_state, audio_spatializer.cpp:484-491)
        for sim in sims:
            if sim.registered and not sim.inst.playbacks:
                server.stop_playback_stream(sim.inst, 0)
                sim.registered = False
    ref = np.concatenate(ref_blocks, axis=1)

    # ---- engine ----
    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=8)
    eng.add_listener(ListenerDesc())
    players = [
        AudioStreamPlayerSpatial(
            eng,
            stream=AudioStreamSample(clips[i], loop=loops[i], sample_rate=MIX_RATE),
            spatializer=AudioSpatializer3D(), max_polyphony=2,
        )
        for i in range(n_players)
    ]
    got_blocks = []
    for b in range(N_BLOCKS):
        for pi, pl in enumerate(players):
            pl.set_position(trajectories[pi][b])
            for ev in schedule[b][pi]:
                if ev == "play":
                    pl.play()
                elif ev == "stop":
                    pl.stop()
                elif ev == "pause":
                    pl.set_stream_paused(True)
                elif ev == "unpause":
                    pl.set_stream_paused(False)
        eng.physics_step()
        got_blocks.append(eng.render_block())
    got = np.concatenate(got_blocks, axis=1)

    err = np.abs(got[:1] - ref[:1]).max()
    peak = np.abs(ref).max()
    assert peak > 1e-2, "stress scenario produced silence — not exercising audio"
    assert err <= DB80 * max(peak, 1.0), f"max deviation {err} vs peak {peak}"


@pytest.mark.parametrize("seed", [200])
def test_randomized_lifecycle_interleaved_paths(seed):
    """The same randomized fuzz with the ENGINE PATH chosen per block:
    split physics_step()+render_block(), fused step(), or
    step_pipelined() — all three share MixState, so interleaving pins the
    `_pending_step`-drop and `_active_host`-cache semantics
    (engine/server.py step/step_pipelined/_step_dispatch) that no
    single-path test stresses.  Adds a generator-stream player (device
    bank patches interleaved with the fused dispatches) and master-fader
    toggles (static-flag recompiles mid-run).

    step_pipelined() returns the PREVIOUS dispatched block (zeros before
    any), and a pending block is dropped by an intervening synchronous
    step() — the comparison maps each returned block to its golden tick
    accordingly."""
    rng = np.random.default_rng(seed)
    n_players = 3
    clips = [
        (rng.standard_normal(int(rng.integers(2000, 30000))) * 0.3).astype(np.float32)
        for _ in range(n_players)
    ]
    loops = [bool(rng.random() < 0.5) for _ in range(n_players)]
    trajectories = [
        [np.array([rng.uniform(-6, 6), rng.uniform(-1, 1), rng.uniform(-6, -1)])
         for _ in range(N_BLOCKS)]
        for _ in range(n_players)
    ]
    schedule = []
    for b in range(N_BLOCKS):
        evs = []
        for pi in range(n_players):
            e = []
            r = rng.random()
            if b == 0 or r < 0.15:
                e.append("play")
            elif r < 0.22:
                e.append("stop")
            elif r < 0.27:
                e.append("pause")
            elif r < 0.32:
                e.append("unpause")
            evs.append(e)
        schedule.append(evs)
    paths = [str(rng.choice(["split", "step", "pipelined"])) for _ in range(N_BLOCKS)]
    # master-fader toggles at fixed blocks (static flags → mid-run recompile)
    fader_db = {20: -6.0, 50: 0.0}

    # generator stream: deterministic sine pushed one block per tick; the
    # ring outlives the whole run, so its content equals a linear clip
    from godot_audio_spatializer_tpu.engine.streams import AudioStreamGenerator

    gen_total = N_BLOCKS * F
    tt = np.arange(gen_total, dtype=np.float64) / MIX_RATE
    gen_sig = (0.3 * np.sin(2 * np.pi * 330.0 * tt)).astype(np.float32)
    gen_pos = np.array([1.0, 0.0, -2.0])

    cfg = g.Spatializer3DConfigG()

    # ---- golden (per engine tick; outputs indexed by tick) ----
    server = g.GoldenAudioServer(SpeakerMode.STEREO, MIX_RATE, F)
    sims = [GoldenPlayerSim(server, clips[i], cfg, loops[i]) for i in range(n_players)]
    gen_stream_g = AudioStreamGenerator(sample_rate=MIX_RATE,
                                        buffer_seconds=(gen_total + 8192) / MIX_RATE)
    ring = gen_stream_g.ring_length
    gen_data_g = np.zeros((ring, 2), np.float32)
    gen_data_g[:gen_total, 0] = gen_sig
    gen_data_g[:gen_total, 1] = gen_sig
    gen_sim = GoldenPlayerSim(server, gen_data_g, cfg, loop=True)
    master_lin = 1.0
    ref_blocks = []
    for b in range(N_BLOCKS):
        if b in fader_db:
            master_lin = float(np.exp(fader_db[b] * 0.11512925464970228))
        for pi, sim in enumerate(sims):
            sim.pos = trajectories[pi][b]
            sim.tick(schedule[b][pi])
        gen_sim.pos = gen_pos
        gen_sim.tick(["play"] if b == 0 else [])
        ref_blocks.append(server.mix_block() * master_lin)
        for sim in sims + [gen_sim]:
            if sim.registered and not sim.inst.playbacks:
                server.stop_playback_stream(sim.inst, 0)
                sim.registered = False
    ref = [blk for blk in ref_blocks]

    # ---- engine ----
    eng = AudioEngine(mix_rate=MIX_RATE, block_size=F, max_sources=12)
    eng.add_listener(ListenerDesc())
    players = [
        AudioStreamPlayerSpatial(
            eng,
            stream=AudioStreamSample(clips[i], loop=loops[i], sample_rate=MIX_RATE),
            spatializer=AudioSpatializer3D(), max_polyphony=2,
        )
        for i in range(n_players)
    ]
    gen_stream = AudioStreamGenerator(sample_rate=MIX_RATE,
                                      buffer_seconds=(gen_total + 8192) / MIX_RATE)
    assert gen_stream.ring_length == ring
    gen_player = AudioStreamPlayerSpatial(
        eng, stream=gen_stream, spatializer=AudioSpatializer3D())
    gen_player.set_position(gen_pos)

    got_blocks, expected_idx = [], []
    pending = None  # golden tick index of the block a pipelined call left
    for b in range(N_BLOCKS):
        if b in fader_db:
            eng.set_bus_volume_db("Master", fader_db[b])
        eng.push_generator_frames(gen_stream, gen_sig[b * F:(b + 1) * F])
        for pi, pl in enumerate(players):
            pl.set_position(trajectories[pi][b])
            for ev in schedule[b][pi]:
                if ev == "play":
                    pl.play()
                elif ev == "stop":
                    pl.stop()
                elif ev == "pause":
                    pl.set_stream_paused(True)
                elif ev == "unpause":
                    pl.set_stream_paused(False)
        if b == 0:
            gen_player.play()
        path = paths[b]
        if path == "split":
            eng.physics_step()
            out, exp = eng.render_block(), b
        elif path == "step":
            out, exp = eng.step(), b
            pending = None  # a sync step drops any pending block
        else:
            out, exp = eng.step_pipelined(), pending
            pending = b
        got_blocks.append(np.asarray(out))
        expected_idx.append(exp)

    peak = max(np.abs(np.concatenate(ref, axis=1)).max(), 1e-9)
    assert peak > 1e-2, "stress scenario produced silence"
    worst = 0.0
    for b, (got, exp) in enumerate(zip(got_blocks, expected_idx)):
        assert np.isfinite(got).all(), f"non-finite output at block {b}"
        want = np.zeros_like(got[:1]) if exp is None else ref[exp][:1]
        err = np.abs(got[:1] - want).max()
        worst = max(worst, err)
        assert err <= DB80 * max(peak, 1.0), (
            f"block {b} (path {paths[b]}, golden tick {exp}): "
            f"deviation {err} vs peak {peak}"
        )
