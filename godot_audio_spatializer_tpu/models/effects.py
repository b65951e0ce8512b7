"""Batched audio effects: the framework's AudioEffect library.

Two families:

* **Source effects** — per-source chains hosted by AudioSpatializerEffect
  (the role Godot AudioEffect/AudioEffectInstance play for the reference,
  audio_spatializer_effect.cpp:33-88).  `init_state(n)` returns per-source
  state with leading N; `process(state, x [N,F,2], ctx)` is jittable.

* **Bus effects** — stateful per-bus processors (the L0 AudioServer bus
  effect chain the module leans on, README.md:96-100): `init_state()`
  returns per-bus state; `process(state, buf [4,F,2])`.

Effect config objects are static under jit (Python scalars only); per-source
modulation flows through EffectCtx bindings (`gain_binding` /
`cutoff_binding`) — the `_process_effects` extension pattern
(reference audio_spatializer_effect.cpp:90-92, example
gd_spatializer_instance.gd:131-133).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..constants import HIGHSHELF_GAIN_EPSILON
from ..ops.biquad import biquad_interp_block
from ..ops.effect_chain import AudioEffectBase, EffectCtx
from ..ops.filters import FilterMode, filter_coeffs
from ..utils.dsp import db_to_linear


class AudioEffectFilter(AudioEffectBase):
    """Biquad filter effect (lowpass/highpass/bandpass/notch/peak/shelves)
    with per-block coefficient interpolation, one stereo-pair state per
    source.

    `cutoff_binding="attenuation_filter_cutoff_hz"` or
    `gain_binding="linear_attenuation"` replace the static value with the
    per-source spatializer parameter each block — occlusion-style filters
    (BASELINE config 3) and the example spatializer's distance highshelf
    both use this.
    """

    def __init__(
        self,
        mode: FilterMode = FilterMode.LOWPASS,
        cutoff_hz: float = 2000.0,
        gain: float = 1.0,
        resonance: float = 0.70710678,
        gain_binding: Optional[str] = None,
        cutoff_binding: Optional[str] = None,
        bypass_below_gain: bool = False,
        precision: str = "default",
    ):
        self.mode = FilterMode(mode)
        self.cutoff_hz = float(cutoff_hz)
        self.gain = float(gain)
        self.resonance = float(resonance)
        self.gain_binding = gain_binding
        self.cutoff_binding = cutoff_binding
        self.bypass_below_gain = bypass_below_gain
        if precision not in ("default", "high"):
            raise ValueError(f"precision must be 'default' or 'high', got {precision!r}")
        # "high": compensated double-float state recurrence (scan_df) —
        # keeps extreme near-pole filters (|pole|→1) inside the −80 dBFS
        # budget; the reference's AudioFilterSW MAC runs in C++ double.
        self.precision = precision

    def init_state(self, n: int):
        return {
            "coeffs": jnp.zeros((n, 5), jnp.float32),
            "hist": jnp.zeros((n, 2, 4), jnp.float32),
        }

    def _resolve(self, ctx: EffectCtx, n: int):
        gain = (
            getattr(ctx, self.gain_binding)
            if self.gain_binding
            else jnp.full(n, self.gain, jnp.float32)
        )
        cutoff = (
            getattr(ctx, self.cutoff_binding)
            if self.cutoff_binding
            else jnp.full(n, self.cutoff_hz, jnp.float32)
        )
        return gain, cutoff

    def process(self, state, x, ctx: EffectCtx):
        n = x.shape[0]
        gain, cutoff = self._resolve(ctx, n)
        coeffs_lo = None
        if (self.precision == "high"
                and not (self.gain_binding or self.cutoff_binding)):
            # static parameters: f64-evaluated coefficients as an f32
            # (hi, lo) pair — recovers the pole position f32 quantizes away
            from ..ops.filters import filter_coeffs_hilo

            hi, lo = filter_coeffs_hilo(
                self.mode, ctx.mix_rate, self.cutoff_hz, self.gain,
                self.resonance,
            )
            target = jnp.broadcast_to(jnp.asarray(hi), (n, 5))
            coeffs_lo = jnp.broadcast_to(jnp.asarray(lo), (n, 2, 5))
        elif (self.precision == "high"
              and self.mode in (FilterMode.LOWPASS, FilterMode.HIGHSHELF)):
            # dynamic bindings: double-float evaluation ON DEVICE
            from ..ops.filters import filter_coeffs_df

            hi, lo = filter_coeffs_df(self.mode, ctx.mix_rate, cutoff, gain,
                                      self.resonance)
            target = hi
            coeffs_lo = jnp.broadcast_to(lo[:, None, :], (n, 2, 5))
        else:
            # precision="high" with a bound non-LOWPASS/HIGHSHELF mode
            # still gets the df MAC, but f32 coefficients
            target = filter_coeffs(self.mode, ctx.mix_rate, cutoff, gain,
                                   self.resonance)
        if self.bypass_below_gain:
            apply = gain >= HIGHSHELF_GAIN_EPSILON
        else:
            apply = jnp.ones(n, bool)
        xl = jnp.moveaxis(x, 2, 1)  # [N,2,F]
        y, hist, coeffs = biquad_interp_block(
            xl,
            jnp.broadcast_to(state["coeffs"][:, None, :], (n, 2, 5)),
            jnp.broadcast_to(target[:, None, :], (n, 2, 5)),
            state["hist"],
            jnp.broadcast_to(apply[:, None], (n, 2)),
            method="scan_df" if self.precision == "high" else None,
            coeffs_lo=coeffs_lo,
        )
        return (
            {"coeffs": coeffs[:, 0], "hist": hist},
            jnp.moveaxis(y, 1, 2),
        )


class AudioEffectAmplify(AudioEffectBase):
    """Gain effect (Godot AudioEffectAmplify equivalent)."""

    def __init__(self, volume_db: float = 0.0):
        self.volume_db = float(volume_db)

    def init_state(self, n: int):
        return ()

    def process(self, state, x, ctx: EffectCtx):
        return state, x * db_to_linear(jnp.float32(self.volume_db))


class AudioEffectDelay(AudioEffectBase):
    """Feedback delay (echo).  Per-source ring buffer [N, D, 2].

    y = dry·x + tap(delay) with feedback."""

    def __init__(self, delay_frames: int = 4410, feedback: float = 0.3,
                 wet: float = 0.5, dry: float = 1.0):
        self.delay_frames = int(delay_frames)
        self.feedback = float(feedback)
        self.wet = float(wet)
        self.dry = float(dry)

    def init_state(self, n: int):
        # every state leaf carries a leading N lane axis (play()-reset and
        # inactive-freeze operate lane-wise)
        return {
            "ring": jnp.zeros((n, self.delay_frames, 2), jnp.float32),
            "pos": jnp.zeros((n,), jnp.int32),
        }

    def process(self, state, x, ctx: EffectCtx):
        D = self.delay_frames
        N, F = x.shape[0], x.shape[1]
        assert D >= F, "delay_frames must be >= block size (read-before-write)"
        ring = state["ring"]
        pos = state["pos"]  # [N]
        idx = (pos[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]) % D  # [N,F]
        delayed = jnp.take_along_axis(ring, idx[:, :, None], axis=1)  # [N,F,2]
        write = x + self.feedback * delayed
        ring = ring.at[jnp.arange(N)[:, None], idx].set(write)
        y = self.dry * x + self.wet * delayed
        return {"ring": ring, "pos": (pos + F) % D}, y


# --------------------------------------------------------------------- buses


class BusEffectFilter(AudioEffectBase):
    """Stateful biquad on a bus's 4 channel pairs."""

    def __init__(self, mode: FilterMode = FilterMode.LOWPASS,
                 cutoff_hz: float = 2000.0, gain: float = 1.0,
                 resonance: float = 0.70710678):
        self.mode = FilterMode(mode)
        self.cutoff_hz = float(cutoff_hz)
        self.gain = float(gain)
        self.resonance = float(resonance)
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate

    def init_state(self):
        return {
            "coeffs": jnp.zeros((4, 2, 5), jnp.float32),
            "hist": jnp.zeros((4, 2, 4), jnp.float32),
        }

    def process(self, state, buf):
        # buf [4,F,2] → lanes [4,2,F]
        target = filter_coeffs(
            self.mode, self._mix_rate,
            jnp.full((4, 2), self.cutoff_hz, jnp.float32),
            jnp.full((4, 2), self.gain, jnp.float32), self.resonance,
        )
        xl = jnp.moveaxis(buf, 2, 1)
        y, hist, coeffs = biquad_interp_block(
            xl, state["coeffs"], target, state["hist"],
            jnp.ones((4, 2), bool),
        )
        return {"coeffs": coeffs, "hist": hist}, jnp.moveaxis(y, 1, 2)


class BusEffectReverb(AudioEffectBase):
    """Feedback-delay-network reverb bus effect (the role of Godot's
    AudioEffectReverb on a Reverb bus — e.g. the demo's Area3D reverb
    routing, reference examples default_bus_layout.tres:10-17).

    8-line FDN with a Householder feedback matrix: unconditionally stable
    for |feedback_gain| < 1, fully vectorized over lines × channels.
    """

    PRIMES = (1433, 1601, 1867, 2053, 2251, 2399, 2689, 2857)

    def __init__(self, room_size: float = 0.8, damping: float = 0.5,
                 wet: float = 0.5, dry: float = 1.0, spread_seconds: float = 0.05,
                 predelay_msec: float = 0.0, predelay_feedback: float = 0.4,
                 hipass: float = 0.0):
        """Parameter surface mirrors Godot AudioEffectReverb: room_size,
        damping, wet, dry, plus predelay_msec/predelay_feedback (input echo
        buffer ahead of the FDN; Godot defaults 150 ms / 0.4 — default 0
        here keeps the plain-FDN behavior unless asked for) and hipass
        (0..1, one-pole highpass on the wet signal)."""
        self.room_size = float(room_size)
        self.damping = float(damping)
        self.wet = float(wet)
        self.dry = float(dry)
        self.spread_seconds = float(spread_seconds)
        self.predelay_msec = float(predelay_msec)
        self.predelay_feedback = float(predelay_feedback)
        self.hipass = float(hipass)
        self._delays = None
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate
        scale = mix_rate / 44100.0 * (0.5 + self.spread_seconds * 10.0)
        self._delays = tuple(
            int(max(block_size + 1, round(p * scale))) for p in self.PRIMES
        )
        self._max_delay = max(self._delays)
        self._predelay = (
            int(max(block_size + 1, round(self.predelay_msec * 1e-3 * mix_rate)))
            if self.predelay_msec > 0.0
            else 0
        )

    def init_state(self):
        L = len(self.PRIMES)
        st = {
            "lines": jnp.zeros((L, 4, self._max_delay, 2), jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
            "lp": jnp.zeros((L, 4, 2), jnp.float32),  # damping one-pole state
        }
        if self._predelay:
            st["pre"] = jnp.zeros((4, self._predelay, 2), jnp.float32)
            st["ppos"] = jnp.zeros((), jnp.int32)
        if self.hipass > 0.0:
            st["hp"] = jnp.zeros((4, 2, 2), jnp.float32)  # (prev_in, prev_out)
        return st

    def process(self, state, buf):
        # buf [4,F,2]
        L = len(self.PRIMES)
        F = buf.shape[1]
        D = self._max_delay
        g = 0.97 * self.room_size
        lines = state["lines"]
        pos = state["pos"]
        lp = state["lp"]
        out_state = dict(state)

        # pre-delay echo buffer ahead of the FDN (AudioEffectReverb
        # predelay_msec/predelay_feedback)
        fdn_in = buf
        if self._predelay:
            P = self._predelay
            ppos = state["ppos"]
            f_idx = jnp.arange(F, dtype=jnp.int32)
            delayed = state["pre"][:, (ppos + f_idx - P) % P]  # [4,F,2]
            out_state["pre"] = state["pre"].at[:, (ppos + f_idx) % P].set(
                buf + self.predelay_feedback * delayed
            )
            out_state["ppos"] = (ppos + F) % P
            fdn_in = delayed

        # read taps: line l delayed by delays[l]
        delays = jnp.asarray(self._delays, jnp.int32)  # [L]
        read_idx = (pos + jnp.arange(F, dtype=jnp.int32)[None, :] - delays[:, None]) % D
        taps = jnp.take_along_axis(
            lines, read_idx[:, None, :, None], axis=2
        )  # [L,4,F,2]

        # block-wise feedback: Householder mix of the tap block (approximates
        # sample-accurate FDN feedback at delays >> block size)
        mixed = taps - (2.0 / L) * taps.sum(axis=0, keepdims=True)
        # damping one-pole on the feedback signal
        d = self.damping
        def damp_scan(carry, m):
            y = (1 - d) * m + d * carry
            return y, y
        lp_new, damped = jax.lax.scan(damp_scan, lp, jnp.moveaxis(mixed, 2, 0))
        damped = jnp.moveaxis(damped, 0, 2)

        write = fdn_in[None] + g * damped  # [L,4,F,2]
        write_idx = (pos + jnp.arange(F, dtype=jnp.int32)) % D
        lines = lines.at[:, :, write_idx].set(write)

        wet_sig = taps.sum(axis=0) / math.sqrt(L)
        # one-pole highpass on the wet signal (AudioEffectReverb hipass):
        # hipass ∈ [0,1] maps to fc = hipass²·8 kHz
        if self.hipass > 0.0:
            fc = (self.hipass ** 2) * 8000.0
            a = 1.0 / (1.0 + 2.0 * math.pi * fc / self._mix_rate)

            def hp_scan(carry, x):
                y = a * (carry[..., 1] + x - carry[..., 0])
                return jnp.stack([x, y], axis=-1), y

            hp_new, wet_hp = jax.lax.scan(
                hp_scan, state["hp"], jnp.moveaxis(wet_sig, 1, 0)
            )
            wet_sig = jnp.moveaxis(wet_hp, 0, 1)
            out_state["hp"] = hp_new

        y = self.dry * buf + self.wet * wet_sig
        out_state.update(lines=lines, pos=(pos + F) % D, lp=lp_new)
        return out_state, y


# ---------------------------------------------------------------------------
# Memoryless source effects (Godot AudioEffectPanner / Distortion /
# StereoEnhance equivalents) — per-source batched, no carried state.
# ---------------------------------------------------------------------------


class AudioEffectPanner(AudioEffectBase):
    """Stereo balance (Godot AudioEffectPanner): pan ∈ [−1, 1];
    lvol = clamp(1−pan, 0, 1), rvol = clamp(1+pan, 0, 1)."""

    def __init__(self, pan: float = 0.0):
        self.pan = float(pan)

    def init_state(self, n: int):
        return ()

    def process(self, state, x, ctx: EffectCtx):
        lvol = min(max(1.0 - self.pan, 0.0), 1.0)
        rvol = min(max(1.0 + self.pan, 0.0), 1.0)
        vol = jnp.asarray([lvol, rvol], jnp.float32)
        return state, x * vol[None, None, :]


class AudioEffectDistortion(AudioEffectBase):
    """Waveshaping distortion (Godot AudioEffectDistortion modes).

    mode: "clip" | "atan" | "lofi" | "overdrive" | "waveshape";
    drive ∈ [0, 1); pre/post gains in dB."""

    def __init__(self, mode: str = "clip", drive: float = 0.0,
                 pre_gain_db: float = 0.0, post_gain_db: float = 0.0):
        assert mode in ("clip", "atan", "lofi", "overdrive", "waveshape")
        self.mode = mode
        self.drive = float(drive)
        self.pre_gain_db = float(pre_gain_db)
        self.post_gain_db = float(post_gain_db)

    def init_state(self, n: int):
        return ()

    def process(self, state, x, ctx: EffectCtx):
        drv = jnp.float32(min(self.drive, 0.999))
        y = x * db_to_linear(jnp.float32(self.pre_gain_db))
        if self.mode == "clip":
            exp = 1.0001 - drv
            y = jnp.sign(y) * jnp.power(
                jnp.clip(jnp.abs(y), 0.0, 1.0), jnp.float32(exp)
            )
        elif self.mode == "atan":
            k = 1.0 + 30.0 * drv
            y = jnp.arctan(y * k) * (2.0 / math.pi)
        elif self.mode == "lofi":
            levels = jnp.float32(2.0 ** (14.0 * (1.0 - drv)))
            y = jnp.round(y * levels) / levels
        elif self.mode == "overdrive":
            k = 2.0 * drv / (1.0 - min(self.drive, 0.999))
            y = (1.0 + k) * y / (1.0 + k * jnp.abs(y))
        else:  # waveshape
            k = 2.0 * drv / (1.0 - min(self.drive, 0.999))
            y = (1.0 + k) * y / (1.0 + k * jnp.abs(y))
            y = jnp.clip(y, -1.0, 1.0)
        return state, y * db_to_linear(jnp.float32(self.post_gain_db))


class AudioEffectStereoEnhance(AudioEffectBase):
    """Mid/side width control (Godot AudioEffectStereoEnhance's
    pan_pullout): side gain > 1 widens, < 1 narrows, 0 = mono."""

    def __init__(self, pan_pullout: float = 1.0):
        self.pan_pullout = float(pan_pullout)

    def init_state(self, n: int):
        return ()

    def process(self, state, x, ctx: EffectCtx):
        mid = 0.5 * (x[..., 0] + x[..., 1])
        side = 0.5 * (x[..., 0] - x[..., 1]) * jnp.float32(self.pan_pullout)
        return state, jnp.stack([mid + side, mid - side], axis=-1)


# ---------------------------------------------------------------------------
# Dynamics bus effects (Godot AudioEffectCompressor / Limiter roles).
# The compressor's envelope follower is expressed as associative scans
# (release = max-decay, attack = one-pole) so a 512-frame block is O(log F)
# depth on the TPU instead of a 512-step sequential loop.
# ---------------------------------------------------------------------------


def _max_decay_scan(d, decay, e_prev):
    """e_t = max(d_t, decay·e_{t−1}) via associative_scan over [F]."""
    d = d.at[0].set(jnp.maximum(d[0], decay * e_prev))
    a = jnp.full_like(d, decay)

    def op(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, jnp.maximum(b2, a2 * b1)

    _, e = jax.lax.associative_scan(op, (a, d))
    return e


def _one_pole_scan(x, alpha, y_prev):
    """y_t = α·y_{t−1} + (1−α)·x_t via associative_scan over [F]."""
    b = (1.0 - alpha) * x
    b = b.at[0].add(alpha * y_prev)
    a = jnp.full_like(x, alpha)

    def op(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(op, (a, b))
    return y


class BusEffectCompressor(AudioEffectBase):
    """Feed-forward compressor on a bus (Godot AudioEffectCompressor role).

    Detector = per-frame peak across the bus's channels; release is a
    max-decay envelope, attack a one-pole smoother; gain above threshold
    follows the ratio law with makeup gain."""

    def __init__(self, threshold_db: float = -12.0, ratio: float = 4.0,
                 attack_us: float = 20000.0, release_ms: float = 250.0,
                 gain_db: float = 0.0):
        self.threshold_db = float(threshold_db)
        self.ratio = float(ratio)
        self.attack_us = float(attack_us)
        self.release_ms = float(release_ms)
        self.gain_db = float(gain_db)
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate

    def init_state(self):
        return {
            "env": jnp.zeros((), jnp.float32),
            "att": jnp.zeros((), jnp.float32),
        }

    def process(self, state, buf):
        rate = self._mix_rate
        rel = math.exp(-1.0 / max(self.release_ms * 1e-3 * rate, 1.0))
        att = math.exp(-1.0 / max(self.attack_us * 1e-6 * rate, 1.0))
        det = jnp.abs(buf).max(axis=(0, 2))  # [F]
        env = _max_decay_scan(det, jnp.float32(rel), state["env"])
        sm = _one_pole_scan(env, jnp.float32(att), state["att"])
        thr = db_to_linear(jnp.float32(self.threshold_db))
        over = jnp.maximum(sm / thr, 1.0)
        gain = jnp.power(over, jnp.float32(1.0 / self.ratio - 1.0))
        gain = gain * db_to_linear(jnp.float32(self.gain_db))
        y = buf * gain[None, :, None]
        return {"env": env[-1], "att": sm[-1]}, y


class BusEffectLimiter(AudioEffectBase):
    """Soft-knee ceiling limiter (Godot AudioEffectLimiter role): unity
    below threshold, smooth compression into the ceiling above it."""

    def __init__(self, ceiling_db: float = -0.1, threshold_db: float = -6.0):
        self.ceiling_db = float(ceiling_db)
        self.threshold_db = float(threshold_db)

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        pass

    def init_state(self):
        return {}

    def process(self, state, buf):
        thr = db_to_linear(jnp.float32(self.threshold_db))
        ceil = db_to_linear(jnp.float32(self.ceiling_db))
        a = jnp.abs(buf)
        # above thr: thr + (ceil−thr)·tanh((a−thr)/(ceil−thr)) → ceiling
        span = jnp.maximum(ceil - thr, 1e-6)
        shaped = thr + span * jnp.tanh((a - thr) / span)
        mag = jnp.where(a > thr, shaped, a)
        return state, jnp.sign(buf) * mag


class BusEffectEQ(AudioEffectBase):
    """Graphic EQ: cascade of peaking biquads at fixed band centers
    (Godot AudioEffectEQ6/10/21 roles)."""

    BANDS6 = (32.0, 100.0, 320.0, 1000.0, 3200.0, 10000.0)
    BANDS10 = (31.25, 62.5, 125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0,
               8000.0, 16000.0)
    # Godot AudioEffectEQ21 band centers
    BANDS21 = (22.0, 32.0, 44.0, 63.0, 90.0, 125.0, 175.0, 250.0, 350.0,
               500.0, 700.0, 1000.0, 1400.0, 2000.0, 2800.0, 4000.0, 5600.0,
               8000.0, 11000.0, 16000.0, 22000.0)

    def __init__(self, band_hz=BANDS6, gains_db=None, bandwidth_octaves: float = 1.0):
        self.band_hz = tuple(float(b) for b in band_hz)
        self.gains_db = tuple(
            float(g) for g in (gains_db or [0.0] * len(self.band_hz))
        )
        assert len(self.gains_db) == len(self.band_hz)
        # RBJ peaking-EQ Q from bandwidth in octaves
        bw = float(bandwidth_octaves)
        self.q = 1.0 / (2.0 * math.sinh(math.log(2.0) / 2.0 * bw))
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate

    def init_state(self):
        nb = len(self.band_hz)
        # start from the IDENTITY biquad (b0=1): the first block then ramps
        # identity → target.  Ramping from the zero filter passes through
        # ill-behaved intermediate (a1, a2) pairs — measured 14× transient
        # blow-up on a 21-band cascade before this fix
        ident = jnp.zeros((nb, 4, 2, 5), jnp.float32).at[..., 0].set(1.0)
        return {
            "coeffs": ident,
            "hist": jnp.zeros((nb, 4, 2, 4), jnp.float32),
        }

    def process(self, state, buf):
        from ..ops.filters import FilterMode, filter_coeffs

        y = jnp.moveaxis(buf, 2, 1)  # [4,2,F]
        new_c, new_h = [], []
        nyq = 0.5 * self._mix_rate
        for i, (hz, gdb) in enumerate(zip(self.band_hz, self.gains_db)):
            glin = math.exp(gdb * 0.11512925464970228)  # host-side dB→linear
            target = filter_coeffs(
                FilterMode.PEAK, self._mix_rate,
                jnp.full((4, 2), min(hz, nyq * 0.95), jnp.float32),
                jnp.full((4, 2), glin, jnp.float32),
                jnp.float32(self.q),
            )
            y, h, c = biquad_interp_block(
                y, state["coeffs"][i], target, state["hist"][i],
                jnp.ones((4, 2), bool),
            )
            new_c.append(c)
            new_h.append(h)
        return (
            {"coeffs": jnp.stack(new_c), "hist": jnp.stack(new_h)},
            jnp.moveaxis(y, 1, 2),
        )


class BusEffectChorus(AudioEffectBase):
    """Multi-voice chorus (Godot AudioEffectChorus role): each voice reads
    the input through a fractionally interpolated delay line whose length
    is modulated by a per-voice LFO.

    voices: list of dicts with delay_ms, depth_ms, rate_hz, level_db
    (defaults mirror a light 2-voice chorus); wet/dry mix on top."""

    def __init__(self, voices=None, wet: float = 0.5, dry: float = 1.0):
        self.voices = voices or [
            {"delay_ms": 15.0, "depth_ms": 2.0, "rate_hz": 0.8, "level_db": 0.0},
            {"delay_ms": 20.0, "depth_ms": 3.0, "rate_hz": 1.2, "level_db": 0.0},
        ]
        self.wet = float(wet)
        self.dry = float(dry)
        self._mix_rate = 44100.0
        self._ring = 0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate
        max_d = max(v["delay_ms"] + v["depth_ms"] for v in self.voices)
        self._ring = int(max_d * 1e-3 * mix_rate) + block_size + 4

    def init_state(self):
        return {
            "ring": jnp.zeros((4, self._ring, 2), jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
            "phase": jnp.zeros(len(self.voices), jnp.float32),
        }

    def process(self, state, buf):
        F = buf.shape[1]
        D = self._ring
        rate = self._mix_rate
        pos = state["pos"]
        write_idx = (pos + jnp.arange(F, dtype=jnp.int32)) % D
        ring = state["ring"].at[:, write_idx].set(buf)

        t = jnp.arange(F, dtype=jnp.float32)
        wet_sum = jnp.zeros_like(buf)
        new_phase = []
        for vi, v in enumerate(self.voices):
            ph = state["phase"][vi] + 2.0 * math.pi * v["rate_hz"] / rate * t
            d = (v["delay_ms"] + v["depth_ms"] * jnp.sin(ph)) * (rate * 1e-3)
            rp = (pos + t) - d  # fractional read position [F]
            i0 = jnp.floor(rp).astype(jnp.int32)
            frac = (rp - i0.astype(jnp.float32))[None, :, None]
            s0 = jnp.take(ring, i0 % D, axis=1)  # [4,F,2]
            s1 = jnp.take(ring, (i0 + 1) % D, axis=1)
            tap = s0 * (1.0 - frac) + s1 * frac
            wet_sum = wet_sum + tap * db_to_linear(jnp.float32(v["level_db"]))
            new_phase.append(
                jnp.mod(
                    state["phase"][vi]
                    + 2.0 * math.pi * v["rate_hz"] / rate * F,
                    2.0 * math.pi,
                )
            )
        y = self.dry * buf + self.wet * wet_sum / max(len(self.voices), 1)
        return (
            {"ring": ring, "pos": (pos + F) % D, "phase": jnp.stack(new_phase)},
            y,
        )


class BusEffectSpectrumAnalyzer(AudioEffectBase):
    """Audio-tap spectrum analyzer (Godot AudioEffectSpectrumAnalyzer
    role): passthrough that keeps the magnitude spectrum of the last
    `fft_size` samples.  Query via `magnitudes(state)` /
    `magnitude_for_frequency_range(state, lo, hz)` on the state fetched
    with `engine.get_bus_effect_state(bus, index)`."""

    def __init__(self, fft_size: int = 1024):
        assert fft_size and (fft_size & (fft_size - 1)) == 0
        self.fft_size = int(fft_size)
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate

    def init_state(self):
        return {
            "tail": jnp.zeros((self.fft_size, 2), jnp.float32),
            "mags": jnp.zeros((2, self.fft_size // 2 + 1), jnp.float32),
        }

    def process(self, state, buf):
        F = buf.shape[1]
        x = buf[0]  # front L/R pair feeds the analyzer (Godot taps the bus)
        seg = jnp.concatenate([state["tail"], x], axis=0)[-self.fft_size :]
        win = jnp.hanning(self.fft_size).astype(jnp.float32)[:, None]
        spec = jnp.fft.rfft(seg * win, axis=0)  # [fft/2+1, 2]
        mags = jnp.abs(spec).T * (2.0 / self.fft_size)
        return {"tail": seg, "mags": mags}, buf

    def magnitudes(self, state):
        """[2 ears, fft/2+1] magnitude spectrum of the last window."""
        import numpy as _np

        return _np.asarray(state["mags"])

    def magnitude_for_frequency_range(self, state, from_hz: float, to_hz: float):
        """Peak magnitude (per ear) within [from_hz, to_hz]."""
        import numpy as _np

        mags = self.magnitudes(state)
        freqs = _np.fft.rfftfreq(self.fft_size, 1.0 / self._mix_rate)
        sel = (freqs >= from_hz) & (freqs <= to_hz)
        if not sel.any():
            return _np.zeros(2, _np.float32)
        return mags[:, sel].max(axis=1)


class BusEffectRecord(AudioEffectBase):
    """Bus capture (Godot AudioEffectRecord role): passthrough that writes
    the bus's front L/R pair into a device-resident ring of
    `max_seconds`.  Fetch with `recording(state)` (trimmed, oldest
    first)."""

    def __init__(self, max_seconds: float = 10.0):
        self.max_seconds = float(max_seconds)
        self._cap = 0
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate
        self._cap = int(self.max_seconds * mix_rate) // block_size * block_size
        self._cap = max(self._cap, block_size)

    def init_state(self):
        return {
            "ring": jnp.zeros((self._cap, 2), jnp.float32),
            "pos": jnp.zeros((), jnp.int32),
            "total": jnp.zeros((), jnp.int64)
            if jax.config.jax_enable_x64
            else jnp.zeros((), jnp.int32),
        }

    def process(self, state, buf):
        F = buf.shape[1]
        x = buf[0]  # front pair
        idx = (state["pos"] + jnp.arange(F, dtype=jnp.int32)) % self._cap
        ring = state["ring"].at[idx].set(x)
        return (
            {
                "ring": ring,
                "pos": (state["pos"] + F) % self._cap,
                "total": state["total"] + F,
            },
            buf,
        )

    def recording(self, state):
        """Captured frames [n, 2] float32, oldest first (≤ max_seconds)."""
        import numpy as _np

        ring = _np.asarray(state["ring"])
        pos = int(_np.asarray(state["pos"]))
        total = int(_np.asarray(state["total"]))
        if total >= self._cap:
            return _np.concatenate([ring[pos:], ring[:pos]], axis=0)
        return ring[:total]


# ------------------------------------------------------------ phaser / shift


def _affine_scan_axis(a, b, y0, axis):
    """y = a·y_prev + b along `axis` via associative_scan; y0 folds into
    the first element.  a, b share shape; y0 has that shape minus `axis`."""
    a = jnp.moveaxis(a, axis, 0)
    b = jnp.moveaxis(b, axis, 0)
    b = b.at[0].add(a[0] * y0)

    def op(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(op, (a, b))
    return jnp.moveaxis(y, 0, axis)


def _phaser_block(state, x, *, mix_rate, range_min_hz, range_max_hz,
                  rate_hz, feedback, depth, stages=6):
    """Time-varying 6-stage allpass phaser on x [..., F, 2].

    Each first-order allpass y=−a·u+z⁻, z=a·z⁻+(1−a²)·u runs as an affine
    associative scan over frames (coefficient a follows the LFO per frame).
    The global feedback tap uses the previous block's output frames (a
    one-block delay instead of Godot's one-sample loop — the sweeping
    notch/resonance character is preserved; L0 effects here are
    capability-equivalent, not bit-parity, like the FDN reverb)."""
    F = x.shape[-2]
    lead = x.shape[:-2]
    t = jnp.arange(F, dtype=jnp.float32)
    ph = state["phase"][..., None] + (2.0 * math.pi * rate_hz / mix_rate) * t
    dmin = range_min_hz / (mix_rate * 0.5)
    dmax = range_max_hz / (mix_rate * 0.5)
    d = dmin + (dmax - dmin) * (jnp.sin(ph) + 1.0) * 0.5  # [..., F]
    a = (1.0 - d) / (1.0 + d)
    a2e = a[..., :, None]  # broadcast over ears → [..., F, 2]

    u = x + feedback * state["fb"]
    z = state["z"]  # [..., stages, 2]
    new_z = []
    for i in range(stages):
        zi0 = z[..., i, :]
        zseq = _affine_scan_axis(
            jnp.broadcast_to(a2e, u.shape),
            (1.0 - a2e * a2e) * u,
            zi0,
            axis=-2,
        )
        z_del = jnp.concatenate([zi0[..., None, :], zseq[..., :-1, :]], axis=-2)
        u = z_del - a2e * u
        new_z.append(zseq[..., -1, :])
    y = x + depth * u
    return (
        {
            "z": jnp.stack(new_z, axis=-2),
            "fb": u,
            "phase": jnp.mod(
                state["phase"] + 2.0 * math.pi * rate_hz / mix_rate * F,
                2.0 * math.pi,
            ),
        },
        y,
    )


class BusEffectPhaser(AudioEffectBase):
    """Phaser bus effect (Godot AudioEffectPhaser role): LFO-swept 6-stage
    allpass cascade with feedback, vectorized over the bus's channels."""

    def __init__(self, range_min_hz: float = 440.0,
                 range_max_hz: float = 1600.0, rate_hz: float = 0.5,
                 feedback: float = 0.7, depth: float = 1.0):
        self.range_min_hz = float(range_min_hz)
        self.range_max_hz = float(range_max_hz)
        self.rate_hz = float(rate_hz)
        self.feedback = float(feedback)
        self.depth = float(depth)
        self._mix_rate = 44100.0
        self._block = 512

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate
        self._block = block_size

    def init_state(self):
        return {
            "z": jnp.zeros((4, 6, 2), jnp.float32),
            "fb": jnp.zeros((4, self._block, 2), jnp.float32),
            "phase": jnp.zeros((4,), jnp.float32),
        }

    def process(self, state, buf):
        return _phaser_block(
            state, buf, mix_rate=self._mix_rate,
            range_min_hz=self.range_min_hz, range_max_hz=self.range_max_hz,
            rate_hz=self.rate_hz, feedback=self.feedback, depth=self.depth,
        )


class AudioEffectPhaser(AudioEffectBase):
    """Per-source batched phaser (source-effect variant of
    BusEffectPhaser for AudioSpatializerEffect chains)."""

    def __init__(self, range_min_hz: float = 440.0,
                 range_max_hz: float = 1600.0, rate_hz: float = 0.5,
                 feedback: float = 0.7, depth: float = 1.0,
                 block_size: int = 512):
        self.range_min_hz = float(range_min_hz)
        self.range_max_hz = float(range_max_hz)
        self.rate_hz = float(rate_hz)
        self.feedback = float(feedback)
        self.depth = float(depth)
        self.block_size = int(block_size)

    def init_state(self, n: int):
        return {
            "z": jnp.zeros((n, 6, 2), jnp.float32),
            "fb": jnp.zeros((n, self.block_size, 2), jnp.float32),
            "phase": jnp.zeros((n,), jnp.float32),
        }

    def process(self, state, x, ctx: EffectCtx):
        if state["fb"].shape[1] != x.shape[1]:  # block-size mismatch guard
            state = dict(state, fb=jnp.zeros_like(x))
        return _phaser_block(
            state, x, mix_rate=ctx.mix_rate,
            range_min_hz=self.range_min_hz, range_max_hz=self.range_max_hz,
            rate_hz=self.rate_hz, feedback=self.feedback, depth=self.depth,
        )


class BusEffectHardLimiter(AudioEffectBase):
    """Lookahead brickwall limiter (Godot AudioEffectHardLimiter role).

    The signal is delayed by the lookahead window; gain is the inverse of
    the sliding-window peak over that window (computed with log-step
    shifted maxima), smoothed with a max-decay release — the output peak
    never exceeds the ceiling."""

    def __init__(self, ceiling_db: float = -0.3, pre_gain_db: float = 0.0,
                 release_s: float = 0.1, lookahead_frames: int = 128):
        self.ceiling_db = float(ceiling_db)
        self.pre_gain_db = float(pre_gain_db)
        self.release_s = float(release_s)
        # power of two so the log-step sliding max covers it exactly
        self.lookahead_frames = int(lookahead_frames)
        assert self.lookahead_frames & (self.lookahead_frames - 1) == 0
        self._mix_rate = 44100.0

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._mix_rate = mix_rate
        assert block_size >= self.lookahead_frames, (
            "hard limiter lookahead must fit in one block"
        )

    def init_state(self):
        La = self.lookahead_frames
        return {
            "delay": jnp.zeros((4, La, 2), jnp.float32),  # delayed signal
            "tailpk": jnp.zeros((La,), jnp.float32),  # prev block's tail peaks
            "red": jnp.ones((), jnp.float32),  # smoothed gain-reduction env
        }

    def process(self, state, buf):
        F = buf.shape[1]
        La = self.lookahead_frames
        pre = db_to_linear(jnp.float32(self.pre_gain_db))
        ceil = db_to_linear(jnp.float32(self.ceiling_db))
        x = buf * pre

        # per-frame peak across channels/ears, prepended with the previous
        # block's tail so the window for the delayed frames is complete
        pk = jnp.abs(x).max(axis=(0, 2))  # [F]
        seq = jnp.concatenate([state["tailpk"], pk])  # [La + F]
        # sliding max over the NEXT La frames (lookahead): log-step shifts
        m = seq
        k = 1
        while k < La:
            m = jnp.maximum(m, jnp.roll(m, -k))
            k *= 2
        win_pk = m[:F]  # peak over [f, f+La) for the delayed stream
        red = jnp.maximum(win_pk / ceil, 1.0)
        rel = math.exp(-1.0 / max(self.release_s * self._mix_rate, 1.0))
        red = _max_decay_scan(red, jnp.float32(rel), state["red"])
        gain = 1.0 / red  # [F]

        delayed = jnp.concatenate([state["delay"], x[:, : F - La]], axis=1)
        y = delayed * gain[None, :, None]
        return (
            {
                "delay": x[:, F - La :],
                "tailpk": pk[F - La :],
                "red": red[-1],
            },
            y,
        )


def _pitch_remap(K: int, ratio: float):
    import numpy as _np

    R = _np.zeros((K, K), _np.float32)
    for k in range(K):
        j = int(round(k * ratio))
        if 0 <= j < K:
            R[j, k] += 1.0
    return jnp.asarray(R)


def _pitch_shift_block(state, x, *, ratio, window, hop, remap):
    """smb-style phase-vocoder pitch shift on x [..., F, 2].

    Per hop: Hann-windowed rfft → true-bin-frequency estimate from the
    phase delta → bin remap through the static one-hot matrix `remap`
    (k → round(k·ratio); magnitudes accumulate, frequencies combine
    magnitude-weighted — the scatter becomes an MXU matmul) → phase
    re-accumulation → irfft → windowed overlap-add.  Latency = window−hop.
    Complex values never leave jit (axon cannot transfer complex64)."""
    F = x.shape[-2]
    W = window
    H = hop
    K = W // 2 + 1
    lead = x.shape[:-2]
    import numpy as _np

    win_np = (0.5 - 0.5 * _np.cos(2.0 * _np.pi * _np.arange(W) / W)).astype(
        _np.float32
    )
    win = jnp.asarray(win_np)
    expct = 2.0 * math.pi * H / W
    kbin = jnp.arange(K, dtype=jnp.float32)
    # exact overlap-add norm for the chosen W/H (numpy: static under jit)
    norm = float((win_np * win_np).sum() / H)

    inbuf = state["in"]        # [..., W, 2]
    outacc = state["out"]      # [..., W + F, 2] overlap-add accumulator
    last_ph = state["last_ph"]  # [..., K, 2]
    sum_ph = state["sum_ph"]    # [..., K, 2]

    for h in range(F // H):
        seg = x[..., h * H : (h + 1) * H, :]
        inbuf = jnp.concatenate([inbuf[..., H:, :], seg], axis=-2)
        frame = inbuf * win[:, None]  # [..., W, 2]
        spec = jnp.fft.rfft(frame, axis=-2)  # [..., K, 2] complex
        mag = jnp.abs(spec).astype(jnp.float32)
        phase = jnp.arctan2(spec.imag, spec.real).astype(jnp.float32)
        delta = phase - last_ph - expct * kbin[:, None]
        last_ph = phase
        delta = delta - 2.0 * math.pi * jnp.round(delta / (2.0 * math.pi))
        true_bin = kbin[:, None] + delta * (W / (2.0 * math.pi * H))
        # remap k → round(k·ratio): magnitudes add, frequency is the
        # magnitude-weighted source frequency × ratio
        mw = jnp.einsum("jk,...ke->...je", remap, mag)
        fw = jnp.einsum("jk,...ke->...je", remap, mag * true_bin)
        syn_freq = jnp.where(mw > 1e-12, fw / jnp.maximum(mw, 1e-12), 0.0) * ratio
        sum_ph = sum_ph + expct * syn_freq
        spec_out = mw * (jnp.cos(sum_ph) + 1j * jnp.sin(sum_ph))
        grain = jnp.fft.irfft(spec_out, n=W, axis=-2).astype(jnp.float32)
        grain = grain * win[:, None] / norm
        pos = h * H  # python int → static slice
        outacc = outacc.at[..., pos : pos + W, :].add(grain)

    y = outacc[..., :F, :]
    # slide the accumulator forward by F, zero-filling the tail
    outacc = jnp.concatenate(
        [outacc[..., F:, :], jnp.zeros(lead + (F, 2), jnp.float32)], axis=-2
    )
    return (
        {"in": inbuf, "out": outacc, "last_ph": last_ph, "sum_ph": sum_ph},
        y,
    )


class BusEffectPitchShift(AudioEffectBase):
    """Phase-vocoder pitch shifter (Godot AudioEffectPitchShift role).

    `pitch_scale` > 1 shifts up.  Window/hop follow the block size
    (W = 4·hop, hop ≤ 256 dividing the block); latency W − hop frames."""

    def __init__(self, pitch_scale: float = 1.0, max_hop: int = 256):
        self.pitch_scale = float(pitch_scale)
        self.max_hop = int(max_hop)
        self._block = 512
        self._window, self._hop = self._geometry(self._block)
        self._remap = _pitch_remap(self._window // 2 + 1, self.pitch_scale)

    def _geometry(self, block_size: int):
        hop = min(self.max_hop, block_size)
        while block_size % hop:
            hop //= 2
        return 4 * hop, hop

    def reset(self, channel_count: int, block_size: int, mix_rate: float):
        self._window, self._hop = self._geometry(block_size)
        self._block = block_size
        self._remap = _pitch_remap(self._window // 2 + 1, self.pitch_scale)

    def init_state(self):
        W, F = self._window, self._block
        K = W // 2 + 1
        return {
            "in": jnp.zeros((4, W, 2), jnp.float32),
            "out": jnp.zeros((4, W + F, 2), jnp.float32),
            "last_ph": jnp.zeros((4, K, 2), jnp.float32),
            "sum_ph": jnp.zeros((4, K, 2), jnp.float32),
        }

    def process(self, state, buf):
        return _pitch_shift_block(
            state, buf, ratio=self.pitch_scale,
            window=self._window, hop=self._hop, remap=self._remap,
        )


class AudioEffectPitchShift(AudioEffectBase):
    """Per-source batched phase-vocoder pitch shifter (source-effect
    variant for AudioSpatializerEffect chains)."""

    def __init__(self, pitch_scale: float = 1.0, block_size: int = 512,
                 max_hop: int = 256):
        self.pitch_scale = float(pitch_scale)
        self.block_size = int(block_size)
        hop = min(int(max_hop), self.block_size)
        while self.block_size % hop:
            hop //= 2
        self._hop = hop
        self._window = 4 * hop
        self._remap = _pitch_remap(self._window // 2 + 1, self.pitch_scale)

    def init_state(self, n: int):
        W, F = self._window, self.block_size
        K = W // 2 + 1
        return {
            "in": jnp.zeros((n, W, 2), jnp.float32),
            "out": jnp.zeros((n, W + F, 2), jnp.float32),
            "last_ph": jnp.zeros((n, K, 2), jnp.float32),
            "sum_ph": jnp.zeros((n, K, 2), jnp.float32),
        }

    def process(self, state, x, ctx: EffectCtx):
        return _pitch_shift_block(
            state, x, ratio=self.pitch_scale,
            window=self._window, hop=self._hop, remap=self._remap,
        )
