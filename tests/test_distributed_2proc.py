"""Real 2-process BoundPool pooling over jax.distributed (CPU backend).

VERDICT r1 item 7: the process_allgather path had only ever run in the
single-process degenerate mode.  Here two actual processes bring up the
jax.distributed runtime against a local coordinator and pool scalars.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax
jax.config.update("jax_platforms", "cpu")

from sypha_tpu.parallel.distributed import BoundPool, initialize_distributed

coord, pid = sys.argv[1], int(sys.argv[2])
n = initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert n == 2, n
pool = BoundPool()
assert pool.n_processes == 2
# process 0 has the better incumbent; process 1 has the lower dual bound
# and requests a stop
inc = 429.0 if pid == 0 else 434.0
dual = 420.0 if pid == 0 else 417.5
stop = pid == 1
out = pool.sync(inc, dual, stop)
assert out.incumbent == 429.0, out
assert out.dual_bound == 417.5, out
assert out.stop, out
# second cadence round: values move, pool again
out = pool.sync(428.0 if pid == 1 else 430.0, 425.0, False)
assert out.incumbent == 428.0, out
assert not out.stop, out
print(f"proc {pid} ok")
"""


def test_bound_pool_two_processes(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # no virtual-device split in the workers

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out
