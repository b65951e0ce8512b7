"""Per-source batched effect chains.

TPU-native counterpart of `AudioSpatializerInstanceEffect::process_frames`
(reference audio_spatializer_effect.cpp:33-88): the reference instantiates
one `AudioEffectInstance` per effect per playback and ping-pongs scalar
buffers through them; here every effect processes all N sources at once
and its per-playback state is a pytree with a leading N axis, carried in
MixState.chain_state.

The batched contract (SURVEY.md §7 "extension hooks"): one chain
*structure* per engine (a static tuple of effect configs); per-source
variation flows through EffectCtx fields (the `_process_effects` pattern —
reference audio_spatializer_effect.cpp:90-92 — where a script retunes
effect parameters from spatializer parameters each block).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

from flax import struct


@struct.dataclass
class EffectCtx:
    """Per-block context every effect can read (parameter modulation)."""

    mix_rate: float = struct.field(pytree_node=False, default=44100.0)
    frame_count: int = struct.field(pytree_node=False, default=512)
    linear_attenuation: Any = None  # [N]
    attenuation_filter_cutoff_hz: Any = None  # [N]
    mix_volumes: Any = None  # [N,4,2]


class AudioEffectBase:
    """Base for all effect config objects: hash/eq BY VALUE (public
    fields), not identity.

    Effects enter the jitted mix programs as STATIC arguments with their
    parameters baked into the trace.  Value hashing makes a live field
    edit (`fx.cutoff_hz = 500.0` mid-playback) a NEW jit cache key, so
    the next block retraces with the new parameters — the same
    static-flag-recompile model the bus mute/solo/fader toggles use.
    This mirrors the reference, where AudioEffectInstances read their
    base resource every process call (L0 AudioEffectInstance contract;
    the module chains them at audio_spatializer_effect.cpp:33-88).
    Edits that change STATE SHAPES (delay length, EQ band count, FFT
    size) are not supported live — the next block fails loudly with a
    state-shape mismatch; re-add the effect instead."""

    def _config(self) -> tuple:
        return (
            type(self).__name__,
            tuple(
                sorted(
                    (k, repr(v))
                    for k, v in vars(self).items()
                    # private attrs are derived caches (e.g. precomputed
                    # remap matrices) — identity follows the public config
                    if not k.startswith("_")
                )
            ),
        )

    def __hash__(self):
        return hash(self._config())

    def __eq__(self, other):
        return type(other) is type(self) and other._config() == self._config()


def _effect_config(e) -> tuple:
    """Value snapshot of one effect's public config (AudioEffectBase's
    `_config`, with the same structural fallback for user-supplied
    processors that don't subclass it)."""
    if isinstance(e, AudioEffectBase):
        return e._config()
    return (
        type(e).__name__,
        tuple(
            sorted(
                (k, repr(v))
                for k, v in vars(e).items()
                if not k.startswith("_")
            )
        ),
    )


def live_config(effect_tree) -> tuple:
    """Fresh immutable snapshot of every effect's live field values in an
    arbitrarily nested tuple/list of effect objects.

    Pass this as an EXTRA static jit argument alongside the effect
    objects themselves.  jit's static-arg cache stores the effect
    OBJECTS as the key; after an in-place field edit the stored key is
    still the same object — equal to itself — so the cache hits and
    silently replays the stale trace (value-based `__hash__` on the
    effect does NOT help: jax compares the stored key against the
    incoming one, and they are the same mutated object).  A fresh value
    snapshot in the key forces the retrace, and the new trace reads the
    edited fields — the reference re-reads the base resource every
    process call (audio_spatializer_effect.cpp:33-88), so live edits
    must land on the next block.  Same trap class as the round-5
    env-knob trace-cache bug (PERF.md)."""
    out = []

    def walk(x):
        if isinstance(x, (tuple, list)):
            for y in x:
                walk(y)
        elif x is not None:
            out.append(_effect_config(x))

    walk(effect_tree)
    return tuple(out)


def chain_init_state(effects: Sequence, n: int) -> Tuple:
    """Zero state for each effect — valid both at engine start and as the
    play()-reset value (fresh AudioEffectInstances per playback, reference
    audio_spatializer_effect.cpp:79-88)."""
    return tuple(e.init_state(n) for e in effects)


def normalize_chains(chain) -> Tuple[Tuple, ...]:
    """Accept either one flat chain (tuple of effects) or a tuple of
    chains; return the tuple-of-chains form.

    Multiple chain *structures* coexist in one engine (the reference lets
    every AudioSpatializerEffect player carry its own effect list,
    audio_spatializer_effect.cpp:157-169); each structure is one group,
    selected per source by BlockParams.chain_group."""
    if not chain:
        return ()
    if hasattr(chain[0], "process"):  # flat single chain
        return (tuple(chain),)
    return tuple(tuple(c) for c in chain)


def chains_init_state(chain, n: int) -> Tuple:
    """Zero state lanes for every group of a (possibly multi-group) chain."""
    return tuple(chain_init_state(c, n) for c in normalize_chains(chain))


def chain_key(effects: Sequence) -> Tuple:
    """Structural identity of a chain (type + static config per effect) —
    players whose chains are configured identically share one group.
    Uses the same value identity as AudioEffectBase.__hash__, with a
    structural fallback for user-supplied processors that don't subclass
    it."""
    return tuple(_effect_config(e) for e in effects)


def _tree_desc(tree) -> str:
    import jax

    import jax.numpy as jnp

    return str(
        jax.tree.map(
            lambda l: f"{jnp.result_type(l)}{tuple(jnp.shape(l))}", tree
        )
    )


def check_effect_state(effect, state, init_thunk) -> None:
    """Trace-time guard: the carried per-playback state must match the
    shapes the effect's CURRENT config would instantiate.

    A live edit that changes a state SHAPE (delay length, EQ band count,
    FFT size) cannot apply to state mid-playback — and without this
    check it does NOT fail on its own: e.g. growing a delay ring makes
    the read indices exceed the carried ring, and XLA CLAMPS
    out-of-bounds gathers, producing silently wrong audio.  Runs at
    trace time only (`jax.eval_shape` — no allocation, no device work);
    an edited config is a new trace (live_config), so the mismatch is
    caught on the first block after the edit."""
    import jax

    expect = jax.eval_shape(init_thunk)
    exp_l, exp_d = jax.tree.flatten(expect)
    got_l, got_d = jax.tree.flatten(state)
    import jax.numpy as jnp

    ok = exp_d == got_d and all(
        tuple(jnp.shape(e)) == tuple(jnp.shape(g))
        and jnp.result_type(e) == jnp.result_type(g)
        for e, g in zip(exp_l, got_l)
    )
    if not ok:
        raise ValueError(
            f"{type(effect).__name__}: carried effect state "
            f"{_tree_desc(state)} does not match what the effect's current "
            f"config instantiates {_tree_desc(expect)}. A live edit changed "
            "a state shape (delay length, EQ band count, FFT size, ...), "
            "which cannot apply to in-flight playback state — re-add the "
            "effect (or stop/start the voice) to re-instantiate its state."
        )


def chain_process(effects: Sequence, states: Tuple, x, ctx: EffectCtx):
    """Run x [N,F,2] through the chain; returns (new_states, y).

    Zero effects → passthrough (reference audio_spatializer_effect.cpp:41-46).
    """
    n = x.shape[0]
    new_states = []
    for e, s in zip(effects, states):
        check_effect_state(e, s, lambda e=e: e.init_state(n))
        s, x = e.process(s, x, ctx)
        new_states.append(s)
    return tuple(new_states), x
