"""Full-trajectory W8A8 quality evidence at flagship width (VERDICT r4 #7).

Runs the complete 50-step 16-view CFG DDIM reverse process TWICE with the
SAME imported flagship weights and the SAME rng stream — once with bf16
convs, once with W8A8 int8 serving (`cfg.model.unet.w8a8`, ops/int8.py) —
and records:

  * the per-step relative L2 drift between the two latent trajectories
    (the quantization error as it propagates through the whole scan, not
    just the 3-step golden prefix tests/test_golden_denoise.py pins);
  * PSNR between the two final decoded image stacks — the quantity the
    serving mode must preserve (reference generate_face.py:243-253 writes
    exactly this image).

Weights come from the bench's native Orbax cache (bench.py populates it on
first real-weights run; BENCH_NATIVE_CACHE to override), so no torch import
happens here. Eta=1.0 noise is identical across modes (same fold_in
stream), so every divergence is quantization, not sampling stochasticity.

  python tools/int8_trajectory.py --out artifacts/int8_trajectory.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="artifacts/int8_trajectory.json")
    ap.add_argument("--native_cache",
                    default=os.environ.get("BENCH_NATIVE_CACHE",
                                           "/tmp/mdtpu_flagship_params"))
    ap.add_argument("--sample_steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    cache_dir = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from morphablediffusion_tpu.utils.config import Config
    from morphablediffusion_tpu.utils.checkpoint import cast_params_for_serving
    from tiny import tiny_batch, tiny_config

    cfg = Config()
    model_bf16 = MorphableDiffusion(cfg.model)
    import copy

    cfg8 = copy.deepcopy(cfg)
    cfg8.model.unet.w8a8 = True
    model_int8 = MorphableDiffusion(cfg8.model)

    t = tiny_config(view_num=cfg.model.view_num,
                    projection=cfg.model.projection)
    t.model.image_size = cfg.model.image_size
    t.model.max_vertices = cfg.model.max_vertices
    batch = {k: jnp.asarray(v)
             for k, v in tiny_batch(t, B=1, with_targets=False).items()}

    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    batch_t = dict(batch)
    batch_t["target_image"] = jnp.zeros(
        (1, cfg.model.view_num, cfg.model.image_size, cfg.model.image_size, 3))
    abstract = jax.eval_shape(
        lambda r, b: model_bf16.init(r, b, method="init_fn"), rngs, batch_t)
    serving_abstract = jax.eval_shape(cast_params_for_serving, abstract)

    if not os.path.isdir(args.native_cache):
        raise SystemExit(
            f"{args.native_cache} missing — run `python bench.py` once with "
            "real weights to populate the native param cache")
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(
            args.native_cache,
            args=ocp.args.PyTreeRestore(
                restore_args=jax.tree.map(
                    lambda s: ocp.ArrayRestoreArgs(
                        restore_type=np.ndarray, dtype=s.dtype),
                    serving_abstract)))
    params = jax.device_put(params)
    print("# params restored from native cache", file=sys.stderr)

    results = {"sample_steps": args.sample_steps, "seed": args.seed}
    trajs, images = {}, {}
    for tag, model in (("bf16", model_bf16), ("w8a8", model_int8)):
        sampler = SyncDDIMSampler(model, sample_steps=args.sample_steps)

        @jax.jit
        def fn(p, b, r):
            prep = model.apply(p, b, method="prepare_inference")
            lat, traj = sampler.denoise_latents(
                p, b, prep, r, 2.0, collect_trajectory=True)
            img = model.apply(p, lat, 0, method="decode_views")
            return traj, img

        t0 = time.time()
        traj, img = fn(params, batch, jax.random.key(args.seed))
        traj = np.asarray(traj)
        img = np.asarray(img)
        print(f"# {tag}: trajectory {traj.shape} in {time.time()-t0:.1f}s "
              f"(first call includes compile)", file=sys.stderr)
        trajs[tag], images[tag] = traj, img

    a, b = trajs["bf16"], trajs["w8a8"]
    denom = np.sqrt((a.reshape(len(a), -1) ** 2).mean(axis=1))
    drift = np.sqrt(((a - b).reshape(len(a), -1) ** 2).mean(axis=1)) / denom
    results["per_step_rel_l2"] = [round(float(d), 5) for d in drift]
    results["final_rel_l2"] = float(drift[-1])

    ia = np.clip(images["bf16"], -1, 1)
    ib = np.clip(images["w8a8"], -1, 1)
    mse = float(((ia - ib) ** 2).mean())
    results["final_image_psnr_bf16_vs_w8a8"] = float(10 * np.log10(4.0 / mse))
    results["final_image_max_abs"] = float(np.abs(ia - ib).max())

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps({k: v for k, v in results.items()
                      if k != "per_step_rel_l2"}))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
