#!/usr/bin/env python
"""Multi-chip rendering over a device mesh — both sharding modes.

Mode 1 (GSPMD, `parallel/mesh.py`): sources shard, the sample bank
replicates; XLA inserts the one bus psum automatically.  Right when the
clip set fits each chip's HBM.

Mode 2 (shard_map, `parallel/sharded.py`): the clip bank itself is
partitioned across the mesh and every source lives on the chip that owns
its clip, so resample gathers stay chip-local — the model-parallel analog
for audio worlds bigger than one chip's memory.  The explicit collective
is one psum of the [B, 4, F, 2] bus input per block over ICI.

Run on any host (the demo provisions an 8-device virtual CPU mesh when
fewer real devices are present):

    python examples/multichip_shard.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# provision a virtual mesh BEFORE the first jax backend use: the env var
# alone is not enough (sitecustomize pins jax_platforms), so the child
# updates the jax config before any backend initializes
import jax  # noqa: E402

if os.environ.get("GAS_MESH_CHILD") == "1":
    jax.config.update("jax_platforms", "cpu")
if len(jax.devices()) < 8:  # pragma: no cover - environment dependent
    if os.environ.get("GAS_MESH_CHILD") == "1":
        raise SystemExit("child still sees <8 devices")
    import subprocess

    env = dict(os.environ)
    env["GAS_MESH_CHILD"] = "1"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    raise SystemExit(
        subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env,
        ).returncode
    )

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from godot_audio_spatializer_tpu.constants import SpeakerMode  # noqa: E402
from godot_audio_spatializer_tpu.engine.offline import (  # noqa: E402
    render_trajectory,
)
from godot_audio_spatializer_tpu.ops.mix import SampleBank  # noqa: E402
from godot_audio_spatializer_tpu.parallel import mesh as pm  # noqa: E402
from godot_audio_spatializer_tpu.parallel.sharded import (  # noqa: E402
    partition_bank,
    render_trajectory_sharded,
)
from godot_audio_spatializer_tpu.utils.benchscene import (  # noqa: E402
    build_bench_scene,
)

D = 8
N, F, K = 256, 512, 24
MIX_RATE = 48000.0

mesh = pm.make_source_mesh(jax.devices()[:D])
print(f"mesh: {mesh.shape} over {jax.default_backend()} devices")

# ---- mode 1: GSPMD source sharding, replicated bank ----
(state, was_out, scene0, pos_seq, vel_seq, params, cfg, bank) = (
    build_bench_scene(N, K, F, MIX_RATE)
)
state_s = pm.shard_mix_state(mesh, state)
scene_s = pm.shard_scene(mesh, scene0)
params_s = pm.shard_source_params(mesh, params)
cfg_s = pm.shard_slot_config(mesh, cfg)
bank_s = pm.shard_bank(mesh, bank)
pos_s, vel_s = pm.shard_trajectory(mesh, pos_seq, vel_seq)
_, _, masters = render_trajectory(
    state_s, was_out, scene_s, pos_s, vel_s, params_s, cfg_s, bank_s,
    speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE, frame_count=F,
)
m = np.asarray(masters)
print(f"mode 1 (GSPMD): master {m.shape}, rms {np.sqrt((m ** 2).mean()):.4f}")

# ---- mode 2: bank-sharded shard_map ----
rng = np.random.default_rng(0)
clip_len = 9600
clips = [
    ((rng.standard_normal((clip_len, 2)) * 0.1).astype(np.float32), True)
    for _ in range(D)
]
banks, lbases = partition_bank(clips, list(range(D)), D, F, 8.0)
clip_of = np.arange(N) // (N // D)  # shard d's sources play shard d's clip
bank2 = SampleBank(
    data=jnp.asarray(banks),
    base=jnp.asarray(np.asarray(lbases, np.int32)[clip_of]),
    length=jnp.full(N, clip_len, np.int32),
    loop=jnp.ones(N, bool),
)
_, _, masters2 = render_trajectory_sharded(
    mesh, state, was_out, scene0, pos_seq, vel_seq, params, cfg, bank2,
    speaker_mode=SpeakerMode.SURROUND_71, mix_rate=MIX_RATE, frame_count=F,
)
m2 = np.asarray(masters2)
print(
    f"mode 2 (bank-sharded shard_map): master {m2.shape}, "
    f"rms {np.sqrt((m2 ** 2).mean()):.4f}"
)

# ---- mode 3: multi-chip STREAMING engine ----
# the full interactive AudioEngine over the mesh: one shard_map step
# program per chip, real play/stop events, single packed fetch per block
from godot_audio_spatializer_tpu.engine.player import (  # noqa: E402
    AudioStreamPlayerSpatial,
)
from godot_audio_spatializer_tpu.engine.scene import ListenerDesc  # noqa: E402
from godot_audio_spatializer_tpu.engine.server import AudioEngine  # noqa: E402
from godot_audio_spatializer_tpu.engine.streams import (  # noqa: E402
    AudioStreamSample,
)
from godot_audio_spatializer_tpu.models.spatializer3d import (  # noqa: E402
    AudioSpatializer3D,
)

eng = AudioEngine(
    mix_rate=MIX_RATE, block_size=F, max_sources=16, mesh=mesh,
    speaker_mode=SpeakerMode.SURROUND_71,
)
eng.add_listener(ListenerDesc())
clip3 = (rng.standard_normal(12000) * 0.3).astype(np.float32)
players = []
for i in range(8):
    pl = AudioStreamPlayerSpatial(
        eng, stream=AudioStreamSample(clip3, loop=True, sample_rate=MIX_RATE),
        spatializer=AudioSpatializer3D(),
    )
    pl.set_position([np.cos(i * 0.7), 0.0, -2.0 - np.sin(i * 0.7)])
    pl.play()
    players.append(pl)
blocks = []
for k in range(6):
    players[0].set_position([np.cos(k * 0.2), 0.0, -2.0])
    blocks.append(eng.step())
m3 = np.concatenate(blocks, axis=1)
print(
    f"mode 3 (streaming engine over the mesh): {len(blocks)} blocks, "
    f"rms {np.sqrt((m3 ** 2).mean()):.4f}"
)

if len(sys.argv) > 1:  # write the front channel pair as a WAV
    from godot_audio_spatializer_tpu.utils.wav import write_wav

    front = m2[:, 0].reshape(-1, 2)  # [K·F, 2]
    out = os.path.join(sys.argv[1], "multichip_shard.wav")
    write_wav(out, front, int(MIX_RATE))
    print("wrote", out)
print("multichip demo ok")
