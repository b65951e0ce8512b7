"""Multi-chip execution: shard the source axis over a device mesh.

The workload is embarrassingly parallel over sources until the final bus
accumulation (SURVEY.md §5.8): every per-source tensor shards on its
leading N axis; listeners, areas, and the sample bank replicate; the bus
contraction `einsum('nfe,nbce->bcfe')` contracts over the sharded axis, so
XLA inserts one psum over ICI per block — exactly the collective the math
requires, nothing more.

Usage:
    mesh = make_source_mesh()                      # all local devices
    inputs = shard_engine_inputs(mesh, ...)        # device_put with specs
    render_trajectory(*inputs, ...)                # jit follows shardings
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.offline import SlotConfig
from ..ops.geometry import SceneState, SourceParams
from ..ops.mix import MixState, SampleBank

SOURCE_AXIS = "sources"


def make_source_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (SOURCE_AXIS,))


def _shard0(mesh: Mesh):
    return NamedSharding(mesh, P(SOURCE_AXIS))


def _repl(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_mix_state(mesh: Mesh, state: MixState) -> MixState:
    s = _shard0(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), state)


def shard_scene(mesh: Mesh, scene: SceneState) -> SceneState:
    s, r = _shard0(mesh), _repl(mesh)
    return SceneState(
        source_pos=jax.device_put(scene.source_pos, s),
        source_vel=jax.device_put(scene.source_vel, s),
        source_z_axis=jax.device_put(scene.source_z_axis, s),
        source_active=jax.device_put(scene.source_active, s),
        listener_rot=jax.device_put(scene.listener_rot, r),
        listener_inv=jax.device_put(scene.listener_inv, r),
        listener_origin=jax.device_put(scene.listener_origin, r),
        listener_vel=jax.device_put(scene.listener_vel, r),
        listener_active=jax.device_put(scene.listener_active, r),
        area_center=jax.device_put(scene.area_center, r),
        area_half=jax.device_put(scene.area_half, r),
        area_shape=jax.device_put(scene.area_shape, r),
        area_rot=jax.device_put(scene.area_rot, r),
        area_mask=jax.device_put(scene.area_mask, r),
        area_override_bus=jax.device_put(scene.area_override_bus, r),
        area_reverb_bus=jax.device_put(scene.area_reverb_bus, r),
        area_reverb_amount=jax.device_put(scene.area_reverb_amount, r),
        area_reverb_uniformity=jax.device_put(scene.area_reverb_uniformity, r),
        area_active=jax.device_put(scene.area_active, r),
        area_planes=jax.device_put(scene.area_planes, r),
        area_edges=jax.device_put(scene.area_edges, r),
    )


def shard_source_params(mesh: Mesh, params: SourceParams) -> SourceParams:
    s = _shard0(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), params)


def shard_slot_config(mesh: Mesh, cfg: SlotConfig) -> SlotConfig:
    s = _shard0(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), cfg)


def shard_bank(mesh: Mesh, bank: SampleBank) -> SampleBank:
    s, r = _shard0(mesh), _repl(mesh)
    return SampleBank(
        data=jax.device_put(bank.data, r),
        base=jax.device_put(bank.base, s),
        length=jax.device_put(bank.length, s),
        loop=jax.device_put(bank.loop, s),
        loop_begin=(
            jax.device_put(bank.loop_begin, s)
            if bank.loop_begin is not None
            else None
        ),
    )


def shard_trajectory(mesh: Mesh, pos_seq, vel_seq):
    """[K, N, 3] trajectories shard on the source axis (dim 1)."""
    s = NamedSharding(mesh, P(None, SOURCE_AXIS))
    return jax.device_put(pos_seq, s), jax.device_put(vel_seq, s)
