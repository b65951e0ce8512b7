"""Realtime streaming runner: paced engine loop over the native runtime.

Pipelines host↔device work the way SURVEY.md §5.8 prescribes: the producer
renders block k+1 on the TPU while block k sits in the native lock-free
ring awaiting the output deadline; a consumer (audio callback stand-in)
drains at the mix-rate cadence and accounts underruns via the native pacer.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from ..utils import native
from .server import AudioEngine


@dataclass
class RealtimeStats:
    blocks_rendered: int = 0
    blocks_consumed: int = 0
    underruns: int = 0
    max_lateness_ms: float = 0.0
    peak: float = 0.0
    # set when the consumer thread died on an exception (e.g. a raising
    # sink callback); the producer aborts via stop() in that case
    consumer_error: Optional[str] = None


class RealtimeRunner:
    """Drives an AudioEngine in realtime.

    physics_step runs at the engine's physics rate interleaved with block
    rendering; rendered master blocks (front L/R pair) go through the
    native FrameRing to the consumer callback."""

    def __init__(
        self,
        engine: AudioEngine,
        buffer_blocks: int = 4,
        sink: Optional[Callable[[np.ndarray], None]] = None,
    ):
        if not native.available():
            raise RuntimeError("native runtime unavailable (g++ missing?)")
        self.engine = engine
        self.sink = sink
        self.ring = native.FrameRing(
            capacity_frames=buffer_blocks * engine.block_size, channels=2
        )
        self.stats = RealtimeStats()
        self._stop = threading.Event()
        self._producer_done = threading.Event()
        self._data_ready = threading.Event()

    def stop(self) -> None:
        """Abort the run: the producer's back-pressure wait and loop exit
        at the next check (also set automatically when the consumer thread
        dies, so a raising sink can't hang run() forever)."""
        self._stop.set()

    def _consumer(self, num_blocks: int, realtime: bool):
        try:
            eng = self.engine
            pacer = (
                native.BlockPacer(eng.mix_rate, eng.block_size)
                if realtime else None
            )
            for _ in range(num_blocks):
                if self._stop.is_set():
                    return
                if pacer is not None:
                    pacer.wait()
                else:
                    # offline mode: wait for produced data instead of pacing
                    while (
                        self.ring.readable < eng.block_size
                        and not self._producer_done.is_set()
                    ):
                        self._data_ready.wait(timeout=0.05)
                        self._data_ready.clear()
                frames, got = self.ring.read(eng.block_size, fill_silence=True)
                if got < eng.block_size:
                    self.stats.underruns += 1
                self.stats.blocks_consumed += 1
                peaks, _ = native.meter(frames)
                self.stats.peak = max(
                    self.stats.peak, float(peaks.max(initial=0.0))
                )
                if self.sink is not None:
                    self.sink(frames)
            if pacer is not None:
                self.stats.max_lateness_ms = pacer.max_lateness_ms
        except Exception as e:  # surfaced via stats, not a thread trace
            self.stats.consumer_error = f"{type(e).__name__}: {e}"
        finally:
            # a dead consumer must release the producer's back-pressure
            # wait (a raising sink otherwise spins run() forever once the
            # ring fills)
            self._stop.set()

    def run(self, num_blocks: int, realtime: bool = True,
            pipelined: bool = False) -> RealtimeStats:
        """`pipelined=True` drives the double-buffered engine step
        (AudioEngine.step_pipelined): the device computes block k while the
        host paces block k-1 into the ring — one block of priming silence,
        and the device round trip leaves the pacing-critical path."""
        eng = self.engine
        blocks_per_tick = max(
            1, int(round(eng.mix_rate / eng.block_size / eng.physics_rate))
        )
        if pipelined and blocks_per_tick != 1:
            # explicit knobs that gate off must RAISE (CLAUDE.md family
            # rule): the double-buffered step only exists on the fused
            # one-tick-per-block path
            raise ValueError(
                "pipelined=True needs one physics tick per block "
                f"(blocks_per_tick={blocks_per_tick}: mix_rate/block_size/"
                "physics_rate rounds above 1) — lower physics_rate's "
                "granularity or drive step_pipelined() directly"
            )
        # physics dt must match the ACTUAL tick cadence this loop runs —
        # block-quantized, not the nominal physics_rate: with the engine
        # defaults (44100/512 @ 60 Hz) a tick fires every 11.61 ms block,
        # and advancing physics by 1/60 s there would run simulation time
        # 1.44× faster than audio time and mis-scale update_velocity's
        # position deltas (wrong doppler pitch)
        tick_dt = blocks_per_tick * eng.block_size / eng.mix_rate
        consumer = threading.Thread(
            target=self._consumer, args=(num_blocks, realtime), daemon=True
        )
        consumer.start()
        import time as _time

        for b in range(num_blocks):
            if self._stop.is_set():
                break  # consumer finished/died or stop() was called
            if blocks_per_tick == 1:
                # physics tick every block → fused single-dispatch step
                # (3 device round trips → 1; see AudioEngine.step)
                master = (
                    eng.step_pipelined(tick_dt) if pipelined
                    else eng.step(tick_dt)
                )
            else:
                if b % blocks_per_tick == 0:
                    eng.physics_step(tick_dt)
                master = eng.render_block()  # [C, F, 2]
            stereo = np.ascontiguousarray(master[0].astype(np.float32))  # front pair
            # back-pressure: wait until the ring has room
            while self.ring.writable < stereo.shape[0] and not self._stop.is_set():
                _time.sleep(0.001)
            if self._stop.is_set() and self.ring.writable < stereo.shape[0]:
                break
            self.ring.write(stereo)
            self._data_ready.set()
            self.stats.blocks_rendered += 1
        self._producer_done.set()
        self._data_ready.set()
        consumer.join(timeout=num_blocks * eng.block_size / eng.mix_rate + 10.0)
        return self.stats
