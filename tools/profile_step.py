#!/usr/bin/env python
"""Profile the DDIM denoising step on the real TPU chip and print the
serialized per-op timeline ("XLA Ops" line of /device:TPU:0), grouped by
fusion category.

Usage: python tools/profile_step.py [--steps 3] [--top 40] [--raw]

Method (see PERF.md): jax.profiler.start_trace around a few scan steps, then
parse the xplane proto. Only the "XLA Ops" line is the serialized timeline;
"Async XLA Ops" copy-starts are overlapped weight prefetch and must not be
counted.
"""

import argparse
import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def load_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(glob.escape(logdir), "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def op_timeline(xspace, device_substr="TPU"):
    """[(name, total_ps, count)] from the serialized 'XLA Ops' line."""
    rows = defaultdict(lambda: [0, 0])
    for plane in xspace.planes:
        if device_substr not in plane.name or "SparseCore" in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                rows[name][0] += ev.duration_ps
                rows[name][1] += 1
    return sorted(
        ((k, v[0], v[1]) for k, v in rows.items()), key=lambda r: -r[1]
    )


CATS = [
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("convert", re.compile(r"convert", re.I)),
    ("conv", re.compile(r"^%?(loop_)?convolution|conv", re.I)),
    ("matmul", re.compile(r"dot|einsum|gemm", re.I)),
    ("pallas", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-slice|dynamic-update", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("elementwise/fusion", re.compile(r"fusion|add|multiply|select|exp|rsqrt", re.I)),
]


def categorize(name):
    for cat, rx in CATS:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true", help="print every op row")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from morphablediffusion_tpu.utils.checkpoint import cast_params_for_serving
    from morphablediffusion_tpu.utils.config import Config
    from tiny import tiny_batch, tiny_config

    cfg = Config()
    model = MorphableDiffusion(cfg.model)
    t = tiny_config(view_num=cfg.model.view_num)
    t.model.image_size = cfg.model.image_size
    t.model.max_vertices = cfg.model.max_vertices
    batch = tiny_batch(t, B=1, with_targets=False)

    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    batch_t = dict(batch)
    batch_t["target_image"] = jnp.zeros(
        (1, cfg.model.view_num, cfg.model.image_size, cfg.model.image_size, 3)
    )
    abstract = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), rngs, batch_t
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), abstract)
    params = cast_params_for_serving(params)

    sampler = SyncDDIMSampler(model, sample_steps=args.steps)

    @jax.jit
    def fn(p, b, r):
        images, _ = sampler.sample(p, b, r, cfg_scale=2.0)
        return jnp.sum(images.astype(jnp.float32))

    float(fn(params, batch, jax.random.key(1)))  # compile + warm

    logdir = tempfile.mkdtemp(prefix="mdtpu_prof_")
    jax.profiler.start_trace(logdir)
    float(fn(params, batch, jax.random.key(2)))
    jax.profiler.stop_trace()

    rows = op_timeline(load_xplane(logdir))
    total_ps = sum(r[1] for r in rows)
    print(f"serialized device time: {total_ps/1e12:.4f} s over {args.steps} "
          f"steps (+encode/decode) -> {total_ps/1e12/args.steps*1000:.1f} ms/step-ish")

    cats = defaultdict(int)
    for name, ps, _ in rows:
        cats[categorize(name)] += ps
    print("\nby category:")
    for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<22} {ps/1e9:9.2f} ms  {100*ps/total_ps:5.1f}%")

    print(f"\ntop {args.top} ops:")
    for name, ps, n in rows[: args.top]:
        print(f"  {ps/1e9:9.3f} ms  x{n:<5} {name[:110]}")
    if args.raw:
        for name, ps, n in rows:
            print(f"RAW {ps} {n} {name}")
    print(f"\ntrace: {logdir}")


if __name__ == "__main__":
    main()
