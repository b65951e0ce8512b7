"""Seed-sweep driver for the combination fuzz (tests/fuzz_scenarios.py).

Runs scenarios in parallel worker processes on the CPU backend and
reports any parity failure with its seed (reproduce with
`fs.run_scenario(seed)`; pin fixed bugs' seeds in tests/test_fuzz_combo).

Usage: python tools/fuzz_campaign.py [first_seed] [n_seeds] [n_workers] [mesh]
A 4th arg "mesh" runs every scenario on the 8-virtual-device sharded
streaming engine (AudioEngine(mesh=...)) instead of single-device.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

MESH = len(sys.argv) > 4 and sys.argv[4] == "mesh"
if MESH:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()


def _worker(seed: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
        ),
    )
    import fuzz_scenarios as fs

    try:
        return fs.run_scenario(seed, mesh=MESH)
    except Exception as e:  # a crash is a finding too
        return dict(seed=seed, err=float("inf"), peak=0.0, ok=False,
                    silent=True, crash=f"{type(e).__name__}: {e}")


def main():
    import multiprocessing as mp

    first = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else max(os.cpu_count() - 2, 1)
    seeds = list(range(first, first + n))
    ctx = mp.get_context("spawn")  # fresh jax per worker
    bad, silent = [], []
    with ctx.Pool(workers) as pool:
        for r in pool.imap_unordered(_worker, seeds):
            flag = "OK " if r["ok"] else "BAD"
            if r.get("silent"):
                flag += " (silent)"
            print(
                f"{flag} seed {r['seed']:4d} err {r['err']:.3e} peak "
                f"{r['peak']:.3f} " + (r.get("crash") or ""),
                flush=True,
            )
            if not r["ok"]:
                bad.append(r)
            elif r.get("silent"):
                silent.append(r["seed"])
    print(f"\n{len(seeds)} scenarios: {len(seeds) - len(bad)} ok, {len(bad)} FAILED")
    if silent:
        print(f"note: {len(silent)} scenarios were near-silent (weak): {silent}")
    for r in bad:
        print("FAILED:", r)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
