"""Multi-host SPMD path: a real 2-process JAX cluster on CPU.

The reference scaffolds multi-node flags but never exercises them
(SURVEY §2.3: opt.py:40-45 args, world_size is single-node). Here the
``--multihost`` path (cli/train.py: jax.distributed.initialize) is
exercised for real: two OS processes form a coordinator-based cluster
over 127.0.0.1, each contributing 2 virtual CPU devices, and run a
cross-process psum plus the process-sharded dataset split.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns processes, each pays JAX startup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); coord = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    # the environment's TPU plugin overrides JAX_PLATFORMS at import time;
    # re-pin CPU through the config before the backend initialises
    jax.config.update("jax_platforms", "cpu")
    # multi-process CPU needs the gloo cross-process transport
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=2, process_id=proc_id)
    import jax.numpy as jnp
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 procs

    # cross-process collective: global psum over one axis spanning both hosts
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    mesh = Mesh(jax.devices(), ("data",))
    local = jnp.full((2, 4), float(proc_id + 1))  # 2 local shards
    arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    s = float(total(arr))
    # global array rows: [1,1,2,2] * 4 cols -> sum = (1+1+2+2)*4 = 24
    assert abs(s - 24.0) < 1e-6, s

    # process-sharded input pipeline: disjoint, exhaustive shard split
    sys.path.insert(0, r"%(repo)s")
    from poem_v2_tpu.data.wds import split_urls_for_process
    urls = [f"shard-{i:06d}.tar" for i in range(10)]
    mine = split_urls_for_process(urls, jax.process_index(), jax.process_count())
    print("OK", proc_id, s, len(mine), ",".join(mine), flush=True)
    """
) % {"repo": REPO}


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_psum_and_shard_split(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    # the two processes saw disjoint, exhaustive shard subsets
    shards = []
    for out in outs:
        ok_line = [l for l in out.splitlines() if l.startswith("OK ")][0]
        shards.append(set(ok_line.split()[-1].split(",")))
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == 10
