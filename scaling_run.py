"""Produce SCALING.json: weak-scaling sweep over a virtual 8-device CPU mesh.

Multi-chip hardware is not available in this environment (one tunneled v5e
chip), so the sweep runs on 8 virtual CPU devices — it validates the sharded
program end-to-end and measures the sharding/collective overhead that a real
slice would amortize over ICI (see pyharp_tpu/bench/scaling.py).  Launched
in a clean subprocess so the axon TPU site hook does not latch the device
count at 1 (same pattern as tests/test_parallel.py).

Run:  python scaling_run.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))


def main():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = ROOT
    r = subprocess.run(
        [sys.executable, "-m", "pyharp_tpu.bench.scaling"],
        env=env, capture_output=True, text=True, timeout=3000, cwd=ROOT)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
        sys.exit(1)
    records = [json.loads(line) for line in r.stdout.splitlines()
               if line.strip().startswith("{")]
    out = {
        "note": ("weak scaling on 8 VIRTUAL CPU devices (multi-chip TPU "
                 "hardware unavailable here); validates the sharded program "
                 "and measures sharding overhead, not ICI bandwidth"),
        "mesh": "('col', 'wave') = (n, 1)",
        "records": records,
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
