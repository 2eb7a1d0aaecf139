"""Training entry point for all four lines.

Usage:
    python -m generative_audio_tpu.cli.train -C configs/enhance_train.yaml \
        [-R] [--steps N | --epochs N]

Reference equivalents: tools/train.py (FullSubNet+ DDP launcher),
inpainting/scripts/train/train_restoration_model.py,
train_nppc_model.py, nppc_audio/scripts/run_denoising_nppc.py.
The reference's mp.spawn-per-GPU launcher is replaced by one process per
host over a jax.sharding mesh.
"""
from __future__ import annotations

import argparse
from pathlib import Path

from generative_audio_tpu.utils.config import (
    load_config_file, build_dataclass)
from generative_audio_tpu.utils.logging import get_logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="generative_audio_tpu train")
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-R", "--resume", action="store_true",
                        help="resume from the latest checkpoint")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host TPU pod: autodetect the slice "
                             "topology via jax.distributed (the launcher's "
                             "GAT_* env contract needs no flag)")
    args = parser.parse_args(argv)

    raw = load_config_file(args.configuration)
    line = raw.pop("line")  # enhance | restoration | nppc_inpainting |
    #   nppc_denoising | image_restoration | image_nppc
    checkpoint_dir = raw.pop("checkpoint_dir", "checkpoints")
    # image lines carry no data section (their trainers own the data module)
    data_cfg = raw.pop("data", None)
    loader_cfg = raw.pop("dataloader", {})
    # enhance line: optional in-loop validation + best-model selection
    # (reference base_trainer.py:296-303), with the probe-inclusive
    # criterion as a config option (round-5 promoted workflow)
    val_cfg = raw.pop("validation", None)
    log = get_logger().info

    # Multi-process (multi-host / launcher) runtime: connect, shard the
    # loader per process, assemble global batches, and gate checkpoint
    # writes + logging to the coordinator (reference rank==0 semantics,
    # tools/train.py:33,58).
    from generative_audio_tpu.parallel import distributed as D
    multiprocess = D.initialize(auto=args.distributed)
    dist_mesh = None
    sb_sharding = None
    if multiprocess:
        from generative_audio_tpu.parallel import make_mesh, subband_sharding
        dist_mesh = make_mesh()
        sb_sharding = subband_sharding(dist_mesh)
        loader_cfg = {**loader_cfg, "host_id": D.process_index(),
                      "num_hosts": D.process_count()}
        log(f"distributed: process {D.process_index()}/{D.process_count()}, "
            f"{len(dist_mesh.devices.flat)} global devices")
        # Every rank keeps the checkpoint_dir: restores must happen on ALL
        # ranks (or the non-coordinators would resume from a fresh init and
        # silently diverge); CheckpointManager itself gates WRITES to the
        # coordinator. Only logging is rank-0-gated here.
        if not D.is_coordinator():
            log = lambda *a, **k: None  # noqa: E731

    def _dist(loader):
        """Global-batch adapter (no-op single-process)."""
        return D.DistributedBatches(loader, dist_mesh) if multiprocess \
            else loader

    def _dist_state(trainer):
        """Lift the trainer's (possibly just-restored) TrainState into
        globally-replicated arrays over the mesh, broadcasting rank 0's
        values — required before mixing it with global data-sharded
        batches in one jit (the tests/distributed_worker.py recipe)."""
        if multiprocess:
            trainer.state = D.replicate_from_coordinator(
                dist_mesh, trainer.state)
            if getattr(trainer, "restoration_variables", None) is not None:
                # the image-NPPC frozen branch must be global too
                trainer.restoration_variables = D.replicate_from_coordinator(
                    dist_mesh, trainer.restoration_variables)
            # best-model scalars must also agree across ranks: save_best is
            # a COLLECTIVE orbax save, so if best_score diverged (e.g. a
            # resume from a non-shared checkpoint filesystem restored it on
            # rank 0 only), only some ranks would enter the save and the
            # rest would hang in orbax's barrier.
            if getattr(trainer, "best_score", None) is not None:
                import numpy as _np
                from jax.experimental import multihost_utils
                trainer.best_score = float(
                    multihost_utils.broadcast_one_to_all(
                        _np.float64(trainer.best_score)))
            # RestorationTrainer tracks best_val the same way (save_best
            # on `val < best_val` is a COLLECTIVE orbax save) — if ranks
            # disagree after a resume where best_score.json was visible
            # only to the coordinator, some ranks skip the save and the
            # rest deadlock in orbax's barrier.
            if getattr(trainer, "best_val", None) is not None:
                import numpy as _np
                from jax.experimental import multihost_utils
                trainer.best_val = float(
                    multihost_utils.broadcast_one_to_all(
                        _np.float64(trainer.best_val)))
        return trainer

    from generative_audio_tpu.data import BatchLoader

    if line == "enhance":
        from generative_audio_tpu import train as T
        from generative_audio_tpu.data import (
            AudioDataset, AudioDataSetConfig, DNSTrainDataset, DNSTrainConfig)
        cfg = build_dataclass(T.EnhanceTrainConfig, raw.get("train"))
        if "clean_dataset" in data_cfg:  # DNS scp regime
            dataset = DNSTrainDataset(build_dataclass(DNSTrainConfig, data_cfg))
        else:
            dataset = AudioDataset(build_dataclass(AudioDataSetConfig, data_cfg))
        loader = BatchLoader(dataset, **{"global_batch_size": 18, **loader_cfg})
        trainer = T.EnhanceTrainer(cfg, checkpoint_dir=checkpoint_dir,
                                   subband_sharding=sb_sharding)
        if args.resume:
            trainer.restore_latest()
        _dist_state(trainer)
        val_ds = probe_ds = None
        val_interval, probe_weight = 1, 0.0
        if val_cfg:
            from generative_audio_tpu.data import DNSValidationDataset
            sr = int(data_cfg.get("sr", 16000)) if data_cfg else 16000
            if val_cfg.get("val_dir"):
                val_ds = DNSValidationDataset([val_cfg["val_dir"]], sr=sr)
            if val_cfg.get("probe_dir"):
                probe_ds = DNSValidationDataset([val_cfg["probe_dir"]],
                                                sr=sr)
            val_interval = int(val_cfg.get("validation_interval", 1))
            probe_weight = float(val_cfg.get("probe_weight", 0.0))
        trainer.train(_dist(loader), epochs=args.epochs or 1, log=log,
                      val_dataset=val_ds, validation_interval=val_interval,
                      probe_dataset=probe_ds, probe_weight=probe_weight)

    elif line == "restoration":
        from generative_audio_tpu import train as T
        from generative_audio_tpu.data import (
            AudioInpaintingDataset, AudioInpaintingConfig, collate_inpainting)
        cfg = build_dataclass(T.RestorationTrainConfig, raw.get("train"))
        dataset = AudioInpaintingDataset(
            build_dataclass(AudioInpaintingConfig, data_cfg))
        loader = BatchLoader(dataset, collate_fn=collate_inpainting,
                             **{"global_batch_size": 16, **loader_cfg})
        trainer = T.RestorationTrainer(cfg, checkpoint_dir=checkpoint_dir,
                                       mesh=dist_mesh)
        if args.resume:
            trainer.restore_latest()
        _dist_state(trainer)
        # optional `validation:` dataset block — enables periodic val at
        # log_interval and the val-minimum best/ checkpoint (masked-MSE
        # val is noisy across checkpoints; see the round-4 sweep in
        # artifacts/inpainting_e2e/REPORT.md)
        val_loader = None
        if val_cfg:
            val_ds = AudioInpaintingDataset(
                build_dataclass(AudioInpaintingConfig, val_cfg))
            val_loader = BatchLoader(val_ds, collate_fn=collate_inpainting,
                                     **{"global_batch_size": 16,
                                        **loader_cfg})
        trainer.train(_dist(loader), n_steps=args.steps, n_epochs=args.epochs,
                      val_loader=(_dist(val_loader)
                                  if val_loader is not None else None),
                      log=log)

    elif line == "nppc_inpainting":
        from generative_audio_tpu import train as T
        from generative_audio_tpu.data import (
            AudioInpaintingDataset, AudioInpaintingConfig, collate_inpainting)
        cfg = build_dataclass(T.NPPCInpaintingTrainConfig, raw.get("train"))
        restoration_ckpt = raw.get("pretrained_restoration_checkpoint")
        restoration_vars = None
        if restoration_ckpt:
            from generative_audio_tpu.train import CheckpointManager
            mgr = CheckpointManager(restoration_ckpt)
            probe = T.RestorationTrainer(
                T.RestorationTrainConfig(model=cfg.model.restoration,
                                         num_freqs=cfg.num_freqs,
                                         num_frames=cfg.num_frames))
            tree = {"params": probe.state.params,
                    "batch_stats": probe.state.batch_stats,
                    "opt_state": probe.state.opt_state, "step": 0}
            restored = mgr.restore("latest", tree)
            if restored:
                restoration_vars = {"params": restored["params"],
                                    "batch_stats": restored["batch_stats"]}
        dataset = AudioInpaintingDataset(
            build_dataclass(AudioInpaintingConfig, data_cfg))
        loader = BatchLoader(dataset, collate_fn=collate_inpainting,
                             **{"global_batch_size": 16, **loader_cfg})
        trainer = T.NPPCInpaintingTrainer(
            cfg, restoration_variables=restoration_vars,
            checkpoint_dir=checkpoint_dir, mesh=dist_mesh)
        if args.resume:
            trainer.restore_latest()
        _dist_state(trainer)
        trainer.train(_dist(loader), n_steps=args.steps, n_epochs=args.epochs,
                      log=log)

    elif line == "nppc_denoising":
        from generative_audio_tpu import train as T
        from generative_audio_tpu.data import AudioDataset, AudioDataSetConfig
        cfg = build_dataclass(T.NPPCDenoisingTrainConfig, raw.get("train"))
        dataset = AudioDataset(build_dataclass(AudioDataSetConfig, data_cfg))
        loader = BatchLoader(dataset, **{"global_batch_size": 8, **loader_cfg})
        trainer = T.NPPCDenoisingTrainer(cfg, checkpoint_dir=checkpoint_dir,
                                         mesh=dist_mesh)
        if args.resume:
            trainer.restore_latest()
        _dist_state(trainer)
        trainer.train(_dist(loader), n_steps=args.steps, n_epochs=args.epochs,
                      log=log)

    elif line == "image_restoration":
        from generative_audio_tpu import train as T
        from generative_audio_tpu.models import ImageRestorationConfig
        cfg = build_dataclass(ImageRestorationConfig, raw.get("train"))
        run = raw.get("run", {})
        trainer = T.ImageRestorationTrainer(cfg,
                                            checkpoint_dir=checkpoint_dir,
                                            mesh=dist_mesh)
        _dist_state(trainer)
        trainer.train(n_steps=args.steps or run.get("n_steps", 1000),
                      batch_size=run.get("batch_size", 32),
                      benchmark_every=run.get("benchmark_every"), log=log)

    elif line == "image_nppc":
        from generative_audio_tpu import train as T
        from generative_audio_tpu.models import (
            ImageRestorationConfig, ImageRestorationModel, ImageNPPCConfig)
        from generative_audio_tpu.train import CheckpointManager
        rest_cfg = build_dataclass(ImageRestorationConfig,
                                   raw.get("restoration"))
        rest_model = ImageRestorationModel(rest_cfg)
        # jit_init: jitted on accelerator backends (eager init over the TPU
        # tunnel is minutes-slow), eager on CPU (where the XLA init compile
        # is the slow path — train/state.py:22-31)
        from generative_audio_tpu.train.state import jit_init
        jax = __import__("jax")
        rest_vars = jit_init(rest_model.init)(jax.random.PRNGKey(0))
        rest_ckpt = raw.get("restoration_checkpoint")
        if rest_ckpt:
            mgr = CheckpointManager(rest_ckpt)
            restored = mgr.restore("latest", {"params": rest_vars["params"]},
                                   partial=True)
            if restored:
                rest_vars = dict(rest_vars, params=restored["params"])
        cfg = build_dataclass(ImageNPPCConfig, raw.get("train"))
        run = raw.get("run", {})
        trainer = T.ImageNPPCTrainer(cfg, rest_model, rest_vars,
                                     checkpoint_dir=checkpoint_dir,
                                     mesh=dist_mesh)
        _dist_state(trainer)
        trainer.train(n_steps=args.steps or run.get("n_steps", 1000),
                      batch_size=run.get("batch_size", 32),
                      benchmark_every=run.get("benchmark_every"), log=log)
    else:
        raise ValueError(f"Unknown training line {line!r}")


if __name__ == "__main__":
    main()
