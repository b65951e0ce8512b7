"""Device autotuner for the Pallas doppler-resample kernel.

The kernel's throughput knobs (sources per grid step, in-kernel chunk
size, selection-dot precision) interact with the device generation and
the scene's window size; the shipped defaults were tuned on the bench
device (PERF.md).  This tool re-derives them on whatever device is live —
the cuDNN-style "measure once, remember" loop:

    python -m godot_audio_spatializer_tpu.utils.autotune \
        --n 4096 --frames 512 --max-pitch 1.4

Results persist to ``~/.cache/gas_autotune.json`` keyed by
(device_kind, frame_count, window_rows); `ops.pallas.resample_kernel`
consults the cache (env vars GAS_RS_* still override everything).

Methodology follows PERF.md's measurement discipline: every variant runs
in THIS process, timed inside a `lax.scan` that consumes the carry, with
a measured trivial-dispatch sync floor subtracted (the tunnel's floor
drifts between sessions, so cached *timings* are not comparable across
runs — only the chosen settings persist).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

CACHE_PATH = os.path.expanduser(
    os.environ.get("GAS_AUTOTUNE_CACHE", "~/.cache/gas_autotune.json")
)

# loaded lazily once per process; None = not yet attempted
_cache: Optional[Dict[str, dict]] = None


def _device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _key(frame_count: int, num_rows: int) -> str:
    return f"{_device_kind()}|F{frame_count}|R{num_rows}"


def load_cache() -> Dict[str, dict]:
    global _cache
    if _cache is None:
        try:
            with open(CACHE_PATH) as f:
                _cache = json.load(f)
        except (OSError, ValueError):
            _cache = {}
    return _cache


def lookup(frame_count: int, num_rows: int) -> Optional[dict]:
    """Tuned {s_blk, fchunk, precision} for this device/shape, or None."""
    return load_cache().get(_key(frame_count, num_rows))


def _store(frame_count: int, num_rows: int, best: dict) -> None:
    cache = load_cache()
    cache[_key(frame_count, num_rows)] = best
    os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
    with open(CACHE_PATH, "w") as f:
        json.dump(cache, f, indent=2, sort_keys=True)


def sweep_resample(
    n: int = 4096,
    frame_count: int = 512,
    max_pitch: float = 1.4,
    *,
    blocks: int = 16,
    persist: bool = True,
    verbose: bool = True,
) -> Tuple[dict, float]:
    """Measure kernel variants on the live device; returns (best, ms/block).

    Sweeps s_blk x fchunk for both precisions (split2 first — it has been
    the winner everywhere measured; highest is the exactness fallback).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.resample import FP_BITS, FP_MASK, ROW, window_rows
    from ..ops.pallas.resample_kernel import _resample_tiles

    K = blocks
    R = window_rows(frame_count, max_pitch)
    r2 = 2 * R
    T = 1 << 20
    rng = np.random.default_rng(0)
    bank = (rng.standard_normal((T, 2)) * 0.3).astype(np.float32)
    bank_t = jnp.asarray(bank.reshape(-1, ROW, 2).transpose(0, 2, 1))
    num_rows = bank_t.shape[0]
    base = jnp.zeros((n,), jnp.int32)
    length = jnp.full((n,), T - 64 * ROW, jnp.int32)
    pitch_fp = jnp.full((n,), int(min(max_pitch, 1.2) * (1 << FP_BITS)), jnp.int32)
    c0 = (jnp.arange(n, dtype=jnp.int32) * 517) % (T // 2)

    def _sync(o):
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]

    def _time(fn):
        _sync(fn(c0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fn(c0))
            best = min(best, time.perf_counter() - t0)
        return best / K * 1e3

    def scan_of(body):
        @jax.jit
        def run(c):
            def step(c, _):
                return (c + 577) % (T // 2), body(c)

            _, outs = jax.lax.scan(step, c, None, length=K)
            return outs

        return run

    floor = _time(scan_of(lambda c: (c[:1] + 1).sum()))

    def kernel(c, s_blk, fchunk, precision):
        start_al = (c >> 7) << 7
        rows = ((base + start_al) >> 7)[:, None] + jnp.arange(R, dtype=jnp.int32)
        win = jnp.take(bank_t, jnp.clip(rows, 0, num_rows - 1), axis=0)
        win = win.reshape(n, r2, ROW)
        params = jnp.stack(
            [c & (ROW - 1), jnp.zeros_like(c), pitch_fp >> FP_BITS,
             pitch_fp & FP_MASK, length - 1 - start_al, jnp.ones_like(c),
             jnp.zeros_like(c), jnp.zeros_like(c)], axis=1)
        y, _ = _resample_tiles(
            params, win, frame_count=frame_count, num_rows=R,
            interpret=False, s_blk=s_blk, fchunk=fchunk, precision=precision,
        )
        return y.sum()

    results = []
    for precision in ("split2", "highest"):
        for s_blk in (8, 16, 32, 64):
            for fchunk in (128, 256):
                if frame_count % fchunk or n % s_blk:
                    continue
                t = _time(scan_of(
                    lambda c, s=s_blk, f=fchunk, p=precision: kernel(c, s, f, p)
                )) - floor
                results.append((t, {"s_blk": s_blk, "fchunk": fchunk,
                                    "precision": precision}))
                if verbose:
                    cfg = results[-1][1]
                    print(f"  S={cfg['s_blk']:3d} FCHUNK={cfg['fchunk']:3d} "
                          f"{cfg['precision']:8s}: {t:7.3f} ms/block",
                          flush=True)
        # split2 precision is −105 dB exact (PERF.md); only fall through to
        # timing `highest` when split2 produced nothing (defensive)
        if results:
            break
    t_best, best = min(results, key=lambda r: r[0])
    if verbose:
        print(f"best: {best}  ({t_best:.3f} ms/block, floor {floor:.3f})",
              flush=True)
    if persist:
        _store(frame_count, R, best)
    return best, t_best


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--max-pitch", type=float, default=1.4)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--no-persist", action="store_true")
    args = ap.parse_args()
    sweep_resample(
        args.n, args.frames, args.max_pitch,
        blocks=args.blocks, persist=not args.no_persist,
    )


if __name__ == "__main__":
    main()
