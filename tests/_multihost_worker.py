"""Worker for tests/test_multihost.py: one of two real JAX processes.

Each process owns 2 local CPU devices (4 global), initializes
jax.distributed against the shared coordinator, assembles its per-host
loader shard into a globally-sharded batch via
`global_batch_from_local` (the DistributedSampler equivalent,
reference facescape.py:216-223), and runs a jitted global-mean step whose
result must be identical on both ranks (the gradient-psum pattern of the
sharded train step)."""

import json
import os
import sys


def main():
    coordinator, rank = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=rank
    )
    import numpy as np

    from morphablediffusion_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        global_batch_from_local,
    )

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    assert len(jax.local_devices()) == 2

    # deterministic "dataset": item i -> value i; per-host strided shard
    class Dataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((3,), float(i), np.float32), "idx": np.int32(i)}

    from morphablediffusion_tpu.data.loader import PrefetchLoader

    loader = PrefetchLoader(
        Dataset(), batch_size=4, shuffle=True, seed=7, num_workers=1,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    it = iter(loader)
    local = next(it)
    it.close()

    mesh = create_mesh()
    gbatch = global_batch_from_local(local, mesh)
    # global leading axis = per-host batch x process_count
    assert gbatch["x"].shape == (8, 3), gbatch["x"].shape
    # each host only holds its own rows
    own = {int(i) for i in local["idx"]}
    for shard in gbatch["idx"].addressable_shards:
        assert {int(i) for i in np.asarray(shard.data)} <= own

    # the psum pattern: jitted global reduction over the sharded batch must
    # agree across ranks (XLA inserts the cross-host collective)
    step = jax.jit(
        lambda b: jax.numpy.mean(b["x"]),
        in_shardings=(jax.tree.map(lambda _: batch_sharding(mesh), gbatch),),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
    )
    val = float(step(gbatch))

    # expected: the seeded global permutation's first 4 items of each rank
    order = np.random.default_rng(7).permutation(16)
    want = float(
        np.mean([order[r::2][:4] for r in range(2)]).astype(np.float32)
    )
    print(json.dumps({"rank": rank, "mean": val, "want": want}))
    assert abs(val - want) < 1e-5, (val, want)


if __name__ == "__main__":
    main()
