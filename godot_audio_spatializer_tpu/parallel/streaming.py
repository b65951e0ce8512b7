"""Multi-chip STREAMING engine: the fused interactive step over a mesh.

`AudioEngine(mesh=...)` shards the per-source axis of the whole
interactive pipeline — MixState lanes, slot lanes, scene source lanes and
SourceParams live as `NamedSharding(mesh, P("src"))` arrays; listeners,
areas, the sample bank and the bus-effect state replicate.  Each step is
ONE `shard_map` program per chip (so the Pallas kernels run unmodified on
local shapes — GSPMD cannot partition Pallas calls), with exactly the
collectives the math requires (engine/server.py `_step_impl(axis_name=)`):

  * one `all_gather` of the per-player Stage A lanes (any slot may voice
    any player — slot allocation stays a host-side global pool);
  * `pmax` of the per-player sibling volume-ramp pool (a player's voices
    may land on different shards);
  * one `psum` of the [B,4,F,2] bus input over ICI — the only bulk
    inter-chip traffic; the (tiny) bus-graph reduction then runs
    replicated on every chip;
  * one `all_gather` of the active flags into the packed master+flags
    transfer (single device→host fetch per step, as single-chip).

Contract: `max_sources` (and the padded player-lane count) must divide by
the mesh size.  The fused step path is fully supported (heterogeneous
effect chains included — chain state lanes shard like every [N] lane);
the split physics_step/render_block path falls back to GSPMD automatic
partitioning, which is fine for the scan/xla methods but cannot
partition Pallas kernels.

Reference scalability being matched: the reference mixes all playbacks on
one audio thread (audio_spatializer.cpp:326-527); this mode is the
TPU-native scale-out story for worlds beyond one chip's throughput.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from ..engine.server import _step_impl
from ..ops.geometry import SceneState
from .mesh import SOURCE_AXIS
from .sharded import _SM_KW, shard_map

_SPEC_SRC = P(SOURCE_AXIS)
_SPEC_R = P()


def _scene_specs() -> SceneState:
    fields = {
        name: _SPEC_SRC if name.startswith("source_") else _SPEC_R
        for name in SceneState.__dataclass_fields__
    }
    return SceneState(**fields)


def _bank_specs(bank):
    # bank.base/length/loop/loop_begin are per-SLOT [N] lanes (sharded);
    # bank.data is the replicated global clip bank (chip-local gathers
    # stay correct because base offsets are global into the replica)
    return type(bank)(
        data=_SPEC_R,
        base=_SPEC_SRC,
        length=_SPEC_SRC,
        loop=_SPEC_SRC,
        loop_begin=None if bank.loop_begin is None else _SPEC_SRC,
    )


# LRU-bounded: keys include rapidly-varying statics (bus volume fades
# animate bus_volumes_db), so an unbounded dict would pin a compiled
# shard_map executable per distinct value for the process lifetime.
# Evicted entries drop their jit wrapper (and its executables) for GC —
# the same retrace cost the single-device _step_jit pays on such fades.
from collections import OrderedDict

_CACHE: "OrderedDict" = OrderedDict()
_CACHE_MAX = 16


def sharded_step_fn(mesh, args, statics):
    """The jitted shard_map twin of `engine.server._step_jit` for `mesh`.

    `args` (the live positional tuple) supplies the pytree structures the
    in/out specs must mirror; `statics` is the dict of `_step_jit`'s
    static kwargs.  Compiled callables cache on (mesh, statics, arg
    structure)."""
    key = (
        mesh,
        tuple(sorted(statics.items())),
        jax.tree.structure(args),
    )
    fn = _CACHE.get(key)
    if fn is not None:
        _CACHE.move_to_end(key)
        return fn

    (scene, params, was_out, state, *slot_lanes, bank, fx_states) = args
    assert len(slot_lanes) == 13, "slot-lane arg list drifted from _step_impl"
    src = lambda tree: jax.tree.map(lambda _: _SPEC_SRC, tree)  # noqa: E731
    repl = lambda tree: jax.tree.map(lambda _: _SPEC_R, tree)  # noqa: E731
    in_specs = (
        _scene_specs(),
        src(params),
        _SPEC_SRC,  # was_out [P]
        src(state),
        *([_SPEC_SRC] * 13),
        _bank_specs(bank),
        repl(fx_states),
    )
    out_specs = (
        src(state),   # new MixState
        _SPEC_SRC,    # was_out (local per-shard → global [P])
        _SPEC_R,      # master (replicated after the psum)
        _SPEC_SRC,    # per-source peaks [N]
        repl(fx_states),
        _SPEC_R,      # packed master+flags (flags all-gathered in-body)
    )

    def body(*a):
        return _step_impl(*a, axis_name=SOURCE_AXIS, **statics)

    fn = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            **_SM_KW,
        )
    )
    _CACHE[key] = fn
    if len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return fn
