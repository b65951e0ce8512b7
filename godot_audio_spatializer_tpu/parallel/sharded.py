"""Bank-sharded multi-chip execution (`shard_map` mode).

`parallel/mesh.py` shards sources and REPLICATES the sample bank — fine
when the clip set fits one chip's HBM.  This module adds the
model-parallel analog for big audio worlds: the clip bank itself is
partitioned across the mesh, each device holds only its local sub-bank,
and every source lives on the device that owns its clip, so the resample
gather is entirely chip-local.  The only inter-chip communication is one
`psum` of the [B, 4, F, 2] bus input per block — the collective the math
requires, riding ICI (SURVEY.md §5.8); the (tiny) bus-graph reduction then
runs replicated on every chip.

GSPMD cannot infer that the gather indices stay within the local bank
shard, so this mode uses `shard_map`: the per-device program is the plain
`render_trajectory` on local shapes with `bus_psum_axis` naming the mesh
axis.  Everything else (Stage A, Pallas kernels, scan carries) is
unchanged — the sharded path is the single-chip program over smaller N.

Layout contract:
  * sources are grouped by shard: shard d owns source slots
    [d·Nl, (d+1)·Nl) (Nl = N/D) and every clip those slots play;
  * `banks.data` is [D, Tl, 2] (per-shard sub-banks, padded to the longest
    shard); `banks.base` holds LOCAL offsets into the owning shard's bank.

Use `partition_bank` to build that layout from (clips, per-source clip
ids, per-source shard assignment).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.offline import SlotConfig, render_trajectory
from ..ops.geometry import SceneState
from ..ops.mix import SampleBank
from ..ops.resample import build_bank
from .mesh import SOURCE_AXIS

try:  # modern jax exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map

import inspect

# replication checking was renamed check_rep → check_vma across jax
# versions; the psum makes the replicated outputs actually replicated, so
# disable the static check under either name
_SM_KW = {}
for _name in ("check_vma", "check_rep"):
    if _name in inspect.signature(shard_map).parameters:
        _SM_KW = {_name: False}
        break


def partition_bank(
    clips: Sequence,
    clip_shard: Sequence[int],
    n_shards: int,
    frame_count: int,
    max_pitch: float,
    dtype=np.float32,
    align: int = 128,
) -> Tuple[np.ndarray, List[int]]:
    """Build per-shard sub-banks.

    clips: (data, loop[, loop_begin]) tuples as for `build_bank`;
    clip_shard: owning shard per clip.  Returns (banks [D, Tl, 2],
    local_bases: per-clip base offset within its owning shard's bank).
    """
    datas = []
    bases: List[int] = [0] * len(clips)
    for d in range(n_shards):
        local = [i for i in range(len(clips)) if clip_shard[i] == d]
        if local:
            data_d, bases_d = build_bank(
                [clips[i] for i in local], frame_count, max_pitch,
                dtype=dtype, align=align,
            )
            for i, b in zip(local, bases_d):
                bases[i] = b
        else:
            data_d = np.zeros((align, 2), dtype)
        datas.append(data_d)
    tl = max(d.shape[0] for d in datas)
    banks = np.stack(
        [np.pad(d, ((0, tl - d.shape[0]), (0, 0))) for d in datas]
    )
    return banks, bases


def render_trajectory_sharded(
    mesh: Mesh,
    mix_state,
    was_out,
    scene0: SceneState,
    source_pos_seq,
    source_vel_seq,
    params,
    slot_cfg: SlotConfig,
    banks: SampleBank,  # data [D, Tl, 2]; base/length/loop per-source LOCAL
    **kw,
):
    """`render_trajectory` over a source-sharded mesh with per-shard banks.

    All per-source inputs are sharded on their leading N axis (N must be a
    multiple of the mesh size); `banks.data`'s leading axis is the mesh
    axis.  Returns the same (final_state, was_out, master) contract —
    master is replicated (identical on every chip after the psum).
    """
    n_dev = mesh.shape[SOURCE_AXIS]
    assert banks.data.ndim == 3 and banks.data.shape[0] == n_dev, (
        f"banks.data leading axis ({banks.data.shape[0]}) must equal the "
        f"mesh size ({n_dev}) — one sub-bank per device; a mismatch would "
        f"silently drop sub-banks and gather from the wrong shard"
    )
    spec_src = P(SOURCE_AXIS)
    spec_r = P()

    def scene_specs(sc: SceneState) -> SceneState:
        fields = {}
        for name in sc.__dataclass_fields__:
            fields[name] = spec_src if name.startswith("source_") else spec_r
        return SceneState(**fields)

    def seq_spec(_):
        return P(None, SOURCE_AXIS)

    bank_specs = SampleBank(
        data=P(SOURCE_AXIS),  # leading axis = mesh axis (one sub-bank each)
        base=spec_src,
        length=spec_src,
        loop=spec_src,
        loop_begin=None if banks.loop_begin is None else spec_src,
    )

    in_specs = (
        jax.tree.map(lambda _: spec_src, mix_state),
        spec_src,
        scene_specs(scene0),
        seq_spec(source_pos_seq),
        seq_spec(source_vel_seq),
        jax.tree.map(lambda _: spec_src, params),
        jax.tree.map(lambda _: spec_src, slot_cfg),
        bank_specs,
    )
    # master (or the collect_master=False running power) is identical on
    # every chip after the psum — replicated either way
    out_specs = (
        jax.tree.map(lambda _: spec_src, mix_state),
        spec_src,
        spec_r,
    )

    run = functools.partial(
        render_trajectory, bus_psum_axis=SOURCE_AXIS, **kw
    )

    def local_fn(state, wo, scene, pos, vel, prm, cfg, bank):
        bank = bank.replace(data=bank.data[0])  # [1, Tl, 2] → local [Tl, 2]
        return run(state, wo, scene, pos, vel, prm, cfg, bank)

    shmapped = shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        **_SM_KW,
    )
    return shmapped(
        mix_state, was_out, scene0, source_pos_seq, source_vel_seq,
        params, slot_cfg, banks,
    )
