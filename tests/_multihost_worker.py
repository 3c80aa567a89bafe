"""Worker for the 2-process jax.distributed smoke test (spawned by
tests/test_multihost.py).  Forces the CPU backend FIRST — this machine's
sitecustomize would otherwise claim the tunneled TPU (CLAUDE.md gotcha).

Each process joins the group via scfgp_tpu.parallel.multihost.init_distributed,
contributes a local shard to a global mesh-sharded array, and checks a jitted
cross-process reduction (the same XLA-collective path DP training uses over
DCN) against the closed form.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from scfgp_tpu.parallel.multihost import init_distributed, is_coordinator


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    info = init_distributed(coordinator_address=f"127.0.0.1:{port}",
                            num_processes=2, process_id=pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2, info
    assert is_coordinator() == (pid == 0)

    mesh = jax.make_mesh((2,), ("data",))
    local = jnp.full((2, 3), float(pid + 1))  # process p holds rows of p+1
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    got = float(total)  # replicated output: addressable on every process
    want = 6.0 * 1 + 6.0 * 2  # 2x3 of ones + 2x3 of twos
    assert got == want, (got, want)
    print(f"worker {pid} psum-over-DCN ok: {got}", flush=True)


if __name__ == "__main__":
    main()
