"""Multi-host data-parallel path (VERDICT round 1, item 8).

The reference's distribution is DDP + DistributedSampler
(train_morphable_diffusion.py:303, facescape.py:216-223). Our equivalents —
`PrefetchLoader(process_index, process_count)` strided sharding and
`parallel.mesh.global_batch_from_local`
(jax.make_array_from_process_local_data) — are exercised here both
in-process (sharding semantics) and as a REAL 2-process
`jax.distributed` topology over CPU devices (worker:
tests/_multihost_worker.py)."""

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

import pytest

pytestmark = pytest.mark.slow



class _IndexDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.int32(i)}


def _epoch_indices(loader, epoch=0):
    order = []
    it = iter(loader)
    # one epoch of batches: n_items/process_count/batch_size
    n = len(loader.dataset) // loader.process_count // loader.batch_size
    for _ in range(n):
        order.extend(int(i) for i in next(it)["idx"])
    it.close()
    return order


def test_loader_shards_partition_the_permutation():
    """DistributedSampler contract: the per-host shards of one epoch are
    disjoint and their union is the seeded global permutation."""
    ds = _IndexDataset(24)
    shards = []
    for rank in range(3):
        loader_kwargs = dict(batch_size=4, shuffle=True, seed=11,
                             num_workers=1, process_index=rank,
                             process_count=3)
        from morphablediffusion_tpu.data.loader import PrefetchLoader

        shards.append(_epoch_indices(PrefetchLoader(ds, **loader_kwargs)))
    flat = [i for s in shards for i in s]
    assert len(flat) == 24 and len(set(flat)) == 24
    order = np.random.default_rng(11).permutation(24)
    for rank in range(3):
        assert shards[rank] == [int(i) for i in order[rank::3]]


def test_two_process_global_batch():
    """Real 2-process jax.distributed over CPU: loader shard -> globally
    sharded batch -> jitted cross-host reduction, identical on both ranks."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    worker = str(Path(__file__).parent / "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    deadline = time.time() + 300
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for code, out, err in outs:
        assert code == 0, (out[-500:], err[-3000:])
    means = set()
    for _, out, _ in outs:
        res = json.loads(out.strip().splitlines()[-1])
        means.add(res["mean"])
    assert len(means) == 1  # both ranks computed the same global value
