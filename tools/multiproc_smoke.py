"""2-process distributed smoke: worker + launcher.

Launcher (no args): spawns two worker processes on localhost and checks
both report the full global device set and a correct cross-process
all-gather. Worker (args: <process_id> <num_processes> <port>): calls
init_distributed and runs the collective.

Usage: python tools/multiproc_smoke.py
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def worker(pid: int, n: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, str(REPO))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gnn_motion_planning_tpu.parallel.mesh import (
        global_mesh,
        init_distributed,
    )

    rank, count = init_distributed(f"localhost:{port}", n, pid)
    assert count == n, f"process_count {count} != {n}"
    assert rank == pid

    mesh = global_mesh()
    assert mesh.devices.size == 2 * n, mesh  # 2 local CPU devices each

    from jax.experimental import multihost_utils

    import numpy as np

    gathered = multihost_utils.process_allgather(np.array([pid], np.int32))
    assert gathered.reshape(-1).tolist() == list(range(n)), gathered
    print(f"WORKER_OK pid={pid} global_devices={mesh.devices.size}", flush=True)


def launch(n: int = 2, port: int = 12973, timeout: int = 180) -> None:
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(pid), str(n), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=str(REPO),
        )
        for pid in range(n)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
        if p.returncode != 0:
            print("\n".join(outs))
            raise SystemExit(f"worker failed rc={p.returncode}")
    ok = sum("WORKER_OK" in o for o in outs)
    if ok != n:
        print("\n".join(outs))
        raise SystemExit(f"only {ok}/{n} workers OK")
    print(f"MULTIPROC_SMOKE_OK n={n}")


if __name__ == "__main__":
    if len(sys.argv) == 4:
        worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    else:
        launch()
