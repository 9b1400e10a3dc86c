"""Training CLI.

Parity target: /root/reference/train_morphable_diffusion.py — flags -b/-l/-n/
--seed/--resume/--finetune_from (:26-46), checkpoint cadences (:276-281),
validation sampling every `val_check_interval` steps writing a contact-sheet
JPEG (:601-617 + ImageLogger), per-epoch timing + memory stats (CUDACallback
:149-169 -> step-time + HBM stats here), TensorBoard metrics, and the
refuse-to-overwrite guard (:73-74).

Run (facescape recipe, README.md:35):
  python -m morphablediffusion_tpu.apps.train -b configs/facescape.yaml \
      -l runs -n facescape [--resume] [--finetune_from syncdreamer.ckpt]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def build_datasets(cfg):
    from morphablediffusion_tpu.data.facescape import FaceScapeDataset, train_val_uids
    from morphablediffusion_tpu.data.thuman import THumanDataset
    from morphablediffusion_tpu.data.thuman import train_val_uids as thuman_uids

    d = cfg.data
    m = cfg.model
    if d.dataset == "facescape":
        train_ids, val_ids = train_val_uids()
        if d.uids:
            train_ids = list(d.uids)
        if d.val_uids:
            val_ids = list(d.val_uids)
        mk = lambda ids, seed: FaceScapeDataset(
            d.data_dir, ids, mesh_topology=d.mesh_topology,
            shuffled_expression=d.shuffled_expression, image_size=m.image_size,
            num_views=m.view_num, max_vertices=m.max_vertices, seed=seed,
            **(
                {"flame_assets_dir": d.flame_assets_dir}
                if d.flame_assets_dir else {}
            ),
        )
        return mk(train_ids, d.seed), mk(val_ids, d.seed + 1)
    elif d.dataset == "thuman":
        train_ids, val_ids = thuman_uids()
        if d.uids:
            train_ids = list(d.uids)
        if d.val_uids:
            val_ids = list(d.val_uids)
        mk = lambda ids, seed: THumanDataset(
            d.data_dir, d.smplx_dir, ids, image_size=m.image_size,
            num_views=m.view_num, max_vertices=m.max_vertices, seed=seed,
        )
        return mk(train_ids, d.seed), mk(val_ids, d.seed + 1)
    raise NotImplementedError(d.dataset)


def save_val_sheet(images, batch, path):
    """Contact sheet: one row per sample, input | generated views
    (log_image, morphable_diffusion.py:589-599)."""
    from PIL import Image

    to8 = lambda x: ((np.clip(np.asarray(x), -1, 1) + 1) * 127.5).astype(np.uint8)
    rows = []
    for b in range(images.shape[0]):
        tiles = [to8(batch["input_image"][b])] + [
            to8(images[b, n]) for n in range(images.shape[1])
        ]
        rows.append(np.concatenate(tiles, axis=1))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.concatenate(rows, axis=0)).save(path)


def main(argv=None):
    from morphablediffusion_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-b", "--base", type=str, required=True, help="config yaml")
    parser.add_argument("-l", "--logdir", type=str, default="runs")
    parser.add_argument("-n", "--name", type=str, default="run")
    parser.add_argument("-s", "--seed", type=int, default=6033)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--finetune_from", type=str, default="",
                        help="torch .ckpt (SyncDreamer/SD) to import before training")
    parser.add_argument("--vae_from", type=str, default="",
                        help="pre-trained first-stage .msgpack from "
                             "apps/train_vae.py, grafted into the (frozen) "
                             "first_stage before training — the from-scratch "
                             "recipe's substitute for the SD VAE the "
                             "reference inherits")
    parser.add_argument("--max_steps", type=int, default=0, help="override config")
    parser.add_argument("--profile_steps", type=str, default="",
                        help="capture a jax.profiler trace, e.g. '10-15'")
    parser.add_argument("--rss_restart_gb", type=float, default=0.0,
                        help="self-restart (checkpoint -> os.execv with "
                             "--resume) when host RSS exceeds this many GiB "
                             "at a rolling-checkpoint step. Failure-recovery "
                             "guard for host-side memory leaks outside this "
                             "process's control (the axon TPU plugin retains "
                             "one transferred batch per step — "
                             "/tmp-reproduced; the reference's equivalent is "
                             "crash + `--resume`, SURVEY §5). 0 = off")
    flags = parser.parse_args(argv)

    import jax

    from morphablediffusion_tpu.data.loader import PrefetchLoader
    from morphablediffusion_tpu.parallel.mesh import create_mesh, shard_batch
    from morphablediffusion_tpu.training.trainer import Trainer
    from morphablediffusion_tpu.utils.checkpoint import CheckpointManager
    from morphablediffusion_tpu.utils.config import load_config

    cfg = load_config(flags.base)
    cfg.train.seed = flags.seed
    if flags.max_steps:
        cfg.train.max_steps = flags.max_steps

    run_dir = Path(flags.logdir) / flags.name
    ckpt_mgr = CheckpointManager(
        run_dir / "ckpt",
        rolling_every=cfg.train.rolling_checkpoint_every,
        snapshot_every=cfg.train.checkpoint_every,
    )
    ckpt_mgr.assert_fresh_or_resume(flags.resume)

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(str(run_dir / "tb"))
    except Exception:
        writer = None

    train_ds, val_ds = build_datasets(cfg)
    mesh = create_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    loader = PrefetchLoader(
        train_ds, cfg.data.batch_size, seed=cfg.data.seed,
        num_workers=cfg.data.num_workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    val_loader = PrefetchLoader(
        val_ds, cfg.model.output_num, shuffle=False,
        num_workers=cfg.data.num_workers,
    )

    batches = iter(loader)
    first = shard_batch(next(batches), mesh)
    if flags.resume and ckpt_mgr.latest_step() is not None:
        # Restore straight into the abstract (never-materialized) state:
        # init_state + restore would hold 2x params+moments on device and
        # OOM a single chip at flagship size. The abstract leaves carry
        # shardings so orbax restores the ZeRO-1 opt state directly into
        # its layout (not replicated-then-resharded-by-the-step, which is
        # wasteful and wrong under multi-host restore). --finetune_from is
        # ignored on resume: the checkpoint supersedes the import.
        state = ckpt_mgr.restore(trainer.abstract_state(first))
        print(f"resumed from step {int(state.step)}")
    else:
        state = trainer.init_state(first)
        if flags.vae_from:
            import jax.numpy as jnp
            from flax.core import unfreeze

            from morphablediffusion_tpu.apps.train_vae import load_vae

            vae_params, meta = load_vae(flags.vae_from)
            print(f"grafting first_stage from {flags.vae_from} ({meta})")
            params = unfreeze(state.params)
            like = params["params"]["first_stage"]
            new = unfreeze(vae_params)["params"]
            mismatch = jax.tree.map(
                lambda a, b: a.shape != b.shape, like, new
            )
            assert not any(jax.tree.leaves(mismatch)), (
                "VAE arch mismatch: config vae_ch/vae_ch_mult/"
                "vae_num_res_blocks must match the train_vae run")
            params["params"]["first_stage"] = jax.tree.map(
                lambda a, b: jnp.asarray(b, a.dtype), like, new
            )
            state = state.replace(params=trainer.cast_frozen(params))
        if flags.finetune_from:
            from morphablediffusion_tpu.utils.torch_import import (
                import_torch_checkpoint,
            )

            params = import_torch_checkpoint(
                flags.finetune_from, cfg.model, like=state.params
            )
            state = state.replace(params=params)

    step_fn = trainer.compile_train_step(state.params)
    sample_fn = None
    val_batches = None
    prof_lo = prof_hi = -1
    if flags.profile_steps:
        lo, _, hi = flags.profile_steps.partition("-")
        prof_lo, prof_hi = int(lo), int(hi or lo)

    t_last = time.time()
    batch = first
    while int(state.step) < cfg.train.max_steps:
        if int(state.step) == prof_lo:
            jax.profiler.start_trace(str(run_dir / "profile"))
        state, metrics = step_fn(state, batch)
        step = int(metrics["step"]) + 1
        batch = shard_batch(next(batches), mesh)  # overlap host load w/ device step
        if step - 1 == prof_hi and prof_lo >= 0:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {run_dir / 'profile'}")

        if step % cfg.train.log_every == 0:
            loss = float(metrics["loss"])
            dt = (time.time() - t_last) / cfg.train.log_every
            t_last = time.time()
            mem = jax.local_devices()[0].memory_stats() or {}
            hbm_gb = mem.get("bytes_in_use", 0) / 2**30
            # host RSS: a multi-hour run that creeps toward the kernel OOM
            # killer must be visible in the step log, not just in dmesg
            try:  # /proc is Linux-only; log 0 where it's absent
                with open("/proc/self/statm") as f:
                    rss_gb = int(f.read().split()[1]) * 4096 / 2**30
            except OSError:
                rss_gb = 0.0
            lr = trainer.lr_at(step)
            print(f"step {step} loss {loss:.4f} lr {lr:.2e} "
                  f"{dt*1000:.0f} ms/step hbm {hbm_gb:.1f} GiB "
                  f"rss {rss_gb:.1f} GiB")
            if writer:
                writer.add_scalar("train/loss", loss, step)
                writer.add_scalar("train/step_time_s", dt, step)
                writer.add_scalar("train/grad_norm", float(metrics["grad_norm"]), step)
                writer.add_scalar("train/hbm_gib", hbm_gb, step)
                # LearningRateMonitor parity (train_morphable_diffusion.py
                # :289-292)
                writer.add_scalar("train/lr", lr, step)

        if cfg.train.val_check_interval and step % cfg.train.val_check_interval == 0:
            if jax.process_index() == 0:
                from morphablediffusion_tpu.sampling import SyncDDIMSampler

                if sample_fn is None:
                    # batch_view_num chunks the val sampler's view axis —
                    # required here: the chip also holds fp32 params + AdamW
                    # moments, so the all-16-view graph OOMs at flagship size
                    sampler = SyncDDIMSampler(
                        trainer.model,
                        sample_steps=cfg.model.sample_steps,
                        batch_view_num=cfg.model.batch_view_num,
                    )
                    # jit ONCE; re-jitting per validation would recompile
                    sample_fn = jax.jit(
                        lambda p, b, r: sampler.sample(p, b, r, cfg.model.cfg_scale)
                    )
                if val_batches is None:
                    # ONE live iterator for the whole run: `iter(val_loader)`
                    # per validation would leak a producer thread (+ its
                    # prefetched batches) every 250 steps
                    val_batches = iter(val_loader)
                val_batch = {
                    k: jax.numpy.asarray(v) for k, v in next(val_batches).items()
                }
                images, _ = sample_fn(state.params, val_batch, jax.random.key(step))
                save_val_sheet(
                    np.asarray(images), val_batch,
                    run_dir / "images" / "val" / f"{step}.jpg",
                )

        ckpt_mgr.maybe_save(state, step)

        if (flags.rss_restart_gb
                and step % max(cfg.train.rolling_checkpoint_every, 1) == 0
                and step < cfg.train.max_steps):
            try:
                with open("/proc/self/statm") as f:
                    rss_gb = int(f.read().split()[1]) * 4096 / 2**30
            except OSError:
                rss_gb = 0.0
            if rss_gb > flags.rss_restart_gb:
                # the rolling checkpoint for this step was just saved; replace
                # the process image (resets the leaked host buffers) and
                # resume from it. Compile-cache makes the restart ~minutes.
                import os
                import sys as _sys

                ckpt_mgr.wait()
                if writer:
                    writer.close()
                argv_new = [a for a in (argv if argv is not None
                                        else _sys.argv[1:])]
                if "--resume" not in argv_new:
                    argv_new.append("--resume")
                print(f"rss {rss_gb:.1f} GiB > {flags.rss_restart_gb} GiB: "
                      f"self-restarting with --resume at step {step}",
                      flush=True)
                os.execv(_sys.executable,
                         [_sys.executable, "-m",
                          "morphablediffusion_tpu.apps.train"] + argv_new)

    ckpt_mgr.maybe_save(state, int(state.step), force=True)
    ckpt_mgr.wait()
    batches.close()  # generator close() stops the producer thread
    if val_batches is not None:
        val_batches.close()
    print("training done")


if __name__ == "__main__":
    main()
