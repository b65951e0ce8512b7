"""Auxiliary subsystems: checkpoint/resume, metrics, examples smoke."""

import os
import subprocess
import sys

import numpy as np
import pytest

from godot_audio_spatializer_tpu.engine.scene import ListenerDesc
from godot_audio_spatializer_tpu.engine.server import AudioEngine
from godot_audio_spatializer_tpu.engine.streams import noise_stream
from godot_audio_spatializer_tpu.engine.player import AudioStreamPlayerSpatial
from godot_audio_spatializer_tpu.models.spatializer3d import AudioSpatializer3D


def _engine_with_player():
    eng = AudioEngine(mix_rate=44100.0, block_size=512, max_sources=4)
    eng.add_listener(ListenerDesc())
    player = AudioStreamPlayerSpatial(
        eng, stream=noise_stream(2.0, 44100.0, seed=5, loop=True),
        spatializer=AudioSpatializer3D(),
    )
    player.set_position([2.0, 0.0, -2.0])
    return eng, player


def test_checkpoint_resume_bit_exact(tmp_path):
    """Save mid-playback, render on; reload and re-render — identical audio
    (the golden-trace bit-exact state capture SURVEY §5.4 calls for)."""
    eng, player = _engine_with_player()
    player.play()
    for _ in range(3):
        eng.physics_step()
        eng.render_block()

    ckpt = str(tmp_path / "state.npz")
    eng.save_state(ckpt)
    cont = [eng.render_block() for _ in range(3)]

    eng2, player2 = _engine_with_player()
    player2.play()
    eng2.physics_step()  # establish block params / bank registration
    eng2.load_state(ckpt)
    eng2._block_params = eng._block_params  # same tick snapshot
    cont2 = [eng2.render_block() for _ in range(3)]

    for a, b in zip(cont, cont2):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_resume_paused(tmp_path):
    """A checkpoint taken while PAUSED (manual + tree pause) must resume
    paused: frozen cursors stay frozen, and the loaded engine reports the
    tree state (the pause lanes are carried audio state)."""
    eng, player = _engine_with_player()
    player.play()
    for _ in range(2):
        eng.physics_step()
        eng.render_block()
    player.set_stream_paused(True)
    eng.physics_step()
    eng.render_block()  # ramp-out block — now fully frozen
    eng.set_tree_paused(True)
    ckpt = str(tmp_path / "paused.npz")
    eng.save_state(ckpt)

    eng2, player2 = _engine_with_player()
    player2.play()
    eng2.physics_step()
    eng2.load_state(ckpt)
    eng2._block_params = eng._block_params
    assert eng2._tree_paused is True
    b = eng2.render_block()
    assert float(np.abs(b).max()) == 0.0, "resumed PAUSED state must be silent"
    # cursor stays frozen across resumed blocks
    c0 = np.asarray(eng2.mix_state.cursor_idx).copy()
    eng2.render_block()
    np.testing.assert_array_equal(c0, np.asarray(eng2.mix_state.cursor_idx))


def test_metrics():
    eng, player = _engine_with_player()
    player.play()
    eng.physics_step()
    eng.render_block()
    m = eng.get_metrics()
    assert m["active_sources"] == 1
    assert m["allocated_slots"] == 1
    assert m["free_slots"] == 3
    assert m["source_peaks"] is not None
    assert float(np.asarray(m["source_peaks"]).max()) > 0


@pytest.mark.parametrize("script", ["examples/demo.py", "examples/custom_spatializer.py", "examples/production_mix.py", "examples/offline_bake.py", "examples/realtime_stream.py", "examples/multichip_shard.py"])
def test_examples_run(script, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["DEMO_SECONDS"] = "0.35"
    env["BAKE_SECONDS"] = "0.35"
    r = subprocess.run(
        [sys.executable, script, str(tmp_path)],
        capture_output=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert any(f.endswith(".wav") for f in os.listdir(tmp_path))


def test_bake_cli(tmp_path):
    """gas-bake CLI: JSON scene → WAV via the offline renderer."""
    import json
    import copy

    from godot_audio_spatializer_tpu import cli

    scene = copy.deepcopy(cli.EXAMPLE_SCENE)
    scene["seconds"] = 1.0
    out = str(tmp_path / "bake.wav")
    summary = cli.bake(scene, out, verbose=False)
    assert summary["channels"] == 2
    assert summary["sources"] == 2
    assert 0.9 < summary["seconds"] <= 1.0
    assert summary["peak"] > 0.05  # scene produced signal

    from godot_audio_spatializer_tpu.utils.wav import read_wav

    frames, rate = read_wav(out)
    assert rate == 48000
    assert frames.shape[0] == summary["blocks"] * 512

    # --example prints valid JSON matching the baked schema
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--example"]) == 0
    assert json.loads(buf.getvalue())["sources"]
