"""Multi-host smoke test (VERDICT r2 item 9): two real OS processes under
``jax.distributed.initialize`` on CPU, one cross-process reduction over
DCN-style coordination — exercising parallel/distributed.py beyond its
single-process no-op path (which also hid a real bug: the old guard
probed ``jax.process_count()`` and thereby initialised the backend before
``jax.distributed.initialize`` could run)."""
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
from obia_tpu.parallel.distributed import (initialize, is_coordinator,
                                           process_info)
initialize(coordinator_address=f"localhost:{{port}}", num_processes=2,
           process_id=pid)
info = process_info()
assert info["process_count"] == 2, info
assert info["process_index"] == pid
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("p",))
local = jnp.full((1, 4), float(pid + 1))
garr = jax.make_array_from_single_device_arrays(
    (2, 4), NamedSharding(mesh, P("p", None)),
    [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
print(f"RESULT pid={{pid}} coord={{is_coordinator()}} total={{float(total)}}",
      flush=True)
"""


def test_two_process_distributed_reduction(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    port = "12741"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
        assert p.returncode == 0, out
    joined = "\n".join(outs)
    # 1*4 + 2*4 summed across both processes' shards
    assert "RESULT pid=0 coord=True total=12.0" in joined
    assert "RESULT pid=1 coord=False total=12.0" in joined
