"""Fit/validate orchestration: the reference Trainer + Lightning loop, TPU-native.

Replaces /root/reference/src/lib/trainer.py:20-127 and the Lightning callbacks
(modelWithLoss.py, progressBar.py): one process, one jit-compiled train step
over the device mesh, host-side epoch loop with LR schedule, freeze/defreeze
(recompiles the step once at the defreeze boundary), interval + crash-guard
checkpointing, running loss meters, device health checks, validation with
on-device decode+postprocess and native NDS scoring.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..geometry import stack_inverse_transforms
from ..losses import GenericLoss
from ..ops import fusion_decode, post_process
from ..parallel import make_mesh, replicate, shard_batch
from ..training import (
    create_train_state,
    learning_rate,
    make_train_step,
    resume_state,
    save_checkpoint,
)
from ..training.state import TrainState
from ..utils.observability import (
    AverageMeter,
    DeviceHealthMonitor,
    StageTimer,
    ToleranceCounter,
    estimate_cost,
    plot_history,
)
from ..data.nuscenes_eval import detections_to_results
from ..data.pipeline import Loader


class Trainer:
    def __init__(self, config: ConfigNode, model, dataset_train=None,
                 dataset_val=None, output_dir: str = "output",
                 logger: Optional[logging.Logger] = None):
        self.config = config
        self.model = model
        self.loss_fn = GenericLoss(config)
        self.dataset_train = dataset_train
        self.dataset_val = dataset_val
        self.output_dir = output_dir
        self.logger = logger or logging.getLogger("cfd3d.trainer")
        self.mesh = make_mesh(config.TPU.MESH_DATA, config.TPU.MESH_MODEL,
                              config.TPU.get("MESH_SPATIAL", 1))
        self.health = DeviceHealthMonitor(logger=self.logger)
        from ..utils.metrics_logger import MetricsLogger

        self.metrics = MetricsLogger(output_dir, resume=bool(config.TRAIN.RESUME))
        self.history: Dict[str, Dict[str, list]] = {"train": {}, "val": {}}
        self.start_epoch = 0
        self.state: Optional[TrainState] = None
        self._train_step = {}
        self._eval_step = None
        tol = int(config.TRAIN.get("NONFINITE_TOLERANCE", 5))
        self._nonfinite = ToleranceCounter(tol) if tol > 0 else None

    # ------------------------------------------------------------- state
    def init_state(self, sample_batch):
        batch = jax.tree.map(jnp.asarray, sample_batch)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            jax.random.PRNGKey(self.config.RANDOM_SEED),
            batch["image"], batch.get("pc_hm"), batch.get("pc_dep"),
            batch.get("calib"), train=True,
        )
        state = create_train_state(self.config, self.model, variables)
        load_dir = self.config.MODEL.LOAD_DIR
        if load_dir:
            from ..training import is_torch_checkpoint, load_weights

            if self.config.TRAIN.RESUME and not is_torch_checkpoint(load_dir):
                state, self.start_epoch = resume_state(load_dir, state)
                self.logger.info("resumed from %s at epoch %d", load_dir, self.start_epoch)
            else:
                # native orbax dir OR a reference torch .pt file (weights +
                # epoch + loss history; fresh optimizer either way, matching
                # the reference's loadModel which restores only epoch,
                # model.py:150-152)
                p, s, meta = load_weights(
                    load_dir, state.params, state.batch_stats,
                    dict(self.config.head_conv),
                )
                state = state.replace(params=p, batch_stats=s)
                hist = meta.get("history") or {}
                if hist.get("train") or hist.get("val"):
                    self.history = {"train": dict(hist.get("train", {})),
                                    "val": dict(hist.get("val", {}))}
                    self.logger.info(
                        "migrated loss history: %d train / %d val heads",
                        len(self.history["train"]), len(self.history["val"]),
                    )
                if self.config.TRAIN.RESUME and meta.get("epoch", -1) >= 0:
                    self.start_epoch = meta["epoch"] + 1
                report = meta.get("report")
                if report:
                    self.logger.info(
                        "torch import: %d loaded, %d missing, %d shape-mismatched",
                        len(report["loaded"]), len(report["missing"]),
                        len(report["shape_mismatch"]),
                    )
                self.logger.info("loaded weights from %s", load_dir)
        self.state = state.replace(
            params=replicate(state.params, self.mesh),
            batch_stats=replicate(state.batch_stats, self.mesh),
            opt_state=replicate(state.opt_state, self.mesh),
        )
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        self.logger.info("parameters: %.2fM", n_params / 1e6)
        return self.state

    def _phase_model(self, frozen: bool, backend: str | None = None):
        """Phase-routed DCN impl under ``DCN_IMPL=auto`` on TPU.

        Since the tight-window fix (ops/dcn.py: 9 shift terms per tap at
        R=1 instead of 16, identical forward) the shift hat-sum wins BOTH
        train phases on the v5e at bs8 448x800: unfrozen 340.4 ms/step vs
        select's 547.3 (select's saved residuals also OOM bs8 without
        remat), frozen 116.7 ms vs 135.7 — and the eval forward too
        (same-process A/B: 176.1 vs 166.7 fps), so layers.py's ``auto``
        now also resolves to shift and this routing is explicit
        confirmation. Explicit DCN_IMPL settings are honored for every
        phase.
        """
        impl = str(self.config.MODEL.DLA.get("DCN_IMPL", "auto"))
        backend = backend or jax.default_backend()
        if impl == "auto" and backend == "tpu":
            return self.model.clone(dcn_impl="shift")
        return self.model

    def _step_fn(self, frozen: bool):
        if frozen not in self._train_step:
            # TPU.DONATE: donate the input TrainState's buffers to the step
            # so XLA updates params/opt_state in place instead of allocating
            # a second copy (halves peak HBM for the largest tensors). Safe
            # because self.state is always reassigned to the step's output.
            donate = (0,) if bool(self.config.TPU.DONATE) else ()
            self._train_step[frozen] = jax.jit(
                make_train_step(self._phase_model(frozen), self.loss_fn,
                                freeze_backbone=frozen,
                                accum_steps=int(
                                    self.config.TRAIN.get("GRAD_ACCUM", 1))),
                donate_argnums=donate,
            )
        return self._train_step[frozen]

    # ------------------------------------------------------------- train
    def train(self):
        cfg = self.config
        # multi-host: each process loads a disjoint shard of the identically
        # shuffled index stream and feeds its per-process batch; shard_batch
        # assembles the global array (reference DDP: per-rank loaders with
        # BATCH_SIZE // len(GPUS), main.py:100,117)
        shard = (
            (jax.process_index(), jax.process_count())
            if jax.process_count() > 1
            else None
        )
        loader = Loader(
            self.dataset_train, cfg.TRAIN.BATCH_SIZE, shuffle=cfg.TRAIN.SHUFFLE,
            seed=cfg.RANDOM_SEED, num_threads=cfg.WORKERS, augment=True,
            shard=shard,
        )
        if not cfg.TRAIN.SHUFFLE:
            self.logger.warning(
                "TRAIN.SHUFFLE is off: data order is sequential but "
                "augmentation remains active"
            )
        # synchronous first-batch probe: iterating the threaded loader and
        # abandoning it leaks a prefetch worker that keeps building batches
        first = loader.peek() if hasattr(loader, "peek") else next(iter(loader))
        assert first is not None, "empty training dataset"
        if self.state is None:
            self.init_state(first)

        timer = StageTimer()
        for epoch in range(self.start_epoch, cfg.TRAIN.EPOCHS):
            frozen = bool(cfg.MODEL.FREEZE_BACKBONE) and epoch <= cfg.MODEL.DEFREEZE
            step = self._step_fn(frozen)
            lr = learning_rate(cfg, epoch, self.start_epoch)
            meters = defaultdict(AverageMeter)
            t_epoch = time.time()
            loader.epoch = epoch
            from ..data.pipeline import device_prefetch

            batches = device_prefetch(loader, self.mesh, size=cfg.TPU.PREFETCH)
            profiling = bool(cfg.TPU.PROFILE) and epoch == self.start_epoch
            if profiling:
                # NOTE: must NOT be a local `import jax.profiler` — that
                # binds the name `jax` function-locally and every earlier
                # `jax.*` use in train() raises UnboundLocalError
                jax.profiler.start_trace(os.path.join(self.output_dir, "profile"))
            n_batches = len(loader)
            log_every = max(1, n_batches // 10)
            for i, batch in enumerate(batches):
                timer.start("step")
                self.state, metrics = step(self.state, batch, lr)
                timer.stop("step", metrics["total"])
                for k, v in metrics.items():
                    meters[k].update(float(v))
                self._guard_nonfinite(float(metrics["total"]), epoch, i)
                self.health.check()
                if (i + 1) % log_every == 0 or i + 1 == n_batches:
                    # per-batch progress line (ProgressBar analogue,
                    # progressBar.py:25-57)
                    self.logger.info(
                        "epoch %d [%d/%d] total %.4f (%.0f ms/step)",
                        epoch, i + 1, n_batches, meters["total"].avg,
                        timer.meters["step"].avg * 1e3,
                    )
            if profiling:
                jax.profiler.stop_trace()
            msg = " ".join(f"{k} {m.avg:.4f}" for k, m in sorted(meters.items()))
            self.logger.info(
                "epoch %d lr %.2e (%.1fs) %s", epoch, lr, time.time() - t_epoch, msg
            )
            for k, m in meters.items():
                self.history["train"].setdefault(k, []).append(m.avg)
            self.metrics.scalars(
                {k: m.avg for k, m in meters.items()}, step=epoch, prefix="train/"
            )
            self.metrics.scalars({"lr": lr, "epoch_sec": time.time() - t_epoch},
                                 step=epoch)

            ckpt_dir = os.path.join(self.output_dir, "ckpts")
            if (epoch + 1) % cfg.TRAIN.SAVE_INTERVALS == 0 or epoch + 1 == cfg.TRAIN.EPOCHS:
                save_checkpoint(ckpt_dir, self.state, epoch, self.history)
            if cfg.TRAIN.VAL_INTERVALS > 0 and (epoch + 1) % cfg.TRAIN.VAL_INTERVALS == 0:
                # crash guard: persist before validation (modelWithLoss.py:329-341)
                save_checkpoint(ckpt_dir, self.state, epoch, self.history)
                self.val()
        plot_history(self.history, self.output_dir)
        return self.state

    def _guard_nonfinite(self, total: float, epoch: int, step: int):
        """Abort after N consecutive non-finite losses (divergence guard).

        Tolerance semantics of the reference's guarded logger
        (logger.py:463-485) applied to the loss itself — the nearest
        TPU-side analogue of watching a run melt down in the wandb
        dashboard. The diverged TrainState is deliberately NOT
        checkpointed: the last interval/crash-guard save remains the
        recovery point (a NaN state would poison a resume).
        """
        if self._nonfinite is None:
            return
        if np.isfinite(total):
            self._nonfinite.ok()
            return
        self.logger.warning(
            "non-finite total loss (%s) at epoch %d step %d", total, epoch, step
        )
        if self._nonfinite.fail():
            raise RuntimeError(
                f"total loss non-finite for {self._nonfinite.tolerance} "
                "consecutive steps - training diverged; resume from the "
                "last saved checkpoint with a lower LR"
            )

    # ------------------------------------------------------------- eval
    def _build_eval_step(self):
        cfg = self.config
        k = int(cfg.MODEL.K)
        flip_test = bool(cfg.TEST.FLIP_TEST)
        debug = int(cfg.DEBUG) > 0

        def eval_step(params, batch_stats, batch, trans_mat):
            variables = {"params": params, "batch_stats": batch_stats}
            if flip_test:
                from ..ops import flip_forward

                outputs = flip_forward(
                    lambda v, im, hm, dep, cal: self.model.apply(
                        v, im, hm, dep, cal, train=False
                    ),
                    variables, batch["image"], batch.get("pc_hm"),
                    batch.get("pc_dep"), batch.get("calib"),
                )
            else:
                outputs = self.model.apply(
                    variables,
                    batch["image"], batch.get("pc_hm"), batch.get("pc_dep"),
                    batch.get("calib"), train=False,
                )
            dets = fusion_decode(
                outputs, cfg.MODEL.OUTPUT_SIZE, k=k, norm2d=cfg.MODEL.NORM_2D,
                approx_topk=bool(cfg.MODEL.get("APPROX_TOPK", False)),
            )
            processed = post_process(
                dets, trans_mat, cfg.MODEL.OUTPUT_SIZE, batch["calib"]
            )
            loss, parts = self.loss_fn(outputs, batch, train=False)
            # debug: expose the model's (frustum) radar heatmap for overlays
            pred_pc_hm = outputs[-1].get("pc_hm") if debug else None
            return processed, loss, parts, pred_pc_hm

        return jax.jit(eval_step)

    def val(self, loader: Optional[Loader] = None):
        """Validation + native NDS scoring.

        Multi-process runs shard the split across processes (the reference's
        rank-sharded eval, progressBar.py:85-93,177-185): each process builds
        a padded equal-length index shard (identical batch counts and batch
        sizes everywhere), evaluates it on a PROCESS-LOCAL device mesh — the
        eval program has no cross-sample coupling, so it needs no
        cross-process collectives; putting psums inside it would only add
        gloo/ICI traffic and (measured on the gloo CPU backend) can deadlock
        when concurrent per-loss reductions race communicator setup — and
        merges the fixed-size per-batch detection tensors with ONE
        process_allgather per batch. Pad duplicates dedup through the
        img_id-keyed results dict; every rank ends with the identical full
        results. Loss meters are rank-local. Live-validated by the 2-process
        test in tests/test_multiprocess.py.
        """
        cfg = self.config
        multiproc = jax.process_count() > 1
        eval_mesh = self.mesh
        if multiproc:
            eval_mesh = make_mesh(devices=jax.local_devices())
        default_loader = loader is None
        if loader is None:
            shard = (
                (jax.process_index(), jax.process_count()) if multiproc else None
            )
            loader = Loader(
                self.dataset_val, cfg.TEST.BATCH_SIZE, shuffle=False,
                num_threads=cfg.WORKERS, drop_last=False, drop_keys=(),
                shard=shard, pad_to_batch=multiproc,
            )
        if self.state is None:
            first = (loader.peek() if hasattr(loader, "peek")
                     else next(iter(loader)))
            self.init_state(first)
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
            # one-time FLOPs report (thop analogue, trainer.py:112-117);
            # single-process only (lowering against the global state would
            # drag the global mesh into the local eval path)
            if not multiproc:
                try:
                    first = (loader.peek() if hasattr(loader, "peek")
                             else next(iter(loader)))
                    first.pop("meta", None)
                    cost = self.profile(first)
                    if cost:
                        self.logger.info(
                            "model cost: %.2f GFLOPs, %.2f GiB accessed (per batch)",
                            cost.get("flops", 0) / 1e9,
                            cost.get("bytes_accessed", 0) / 2 ** 30,
                        )
                except Exception:
                    pass
        # rank-local replica of the weights for the process-local eval mesh
        eval_params, eval_stats = self.state.params, self.state.batch_stats
        if multiproc:
            from ..parallel.mesh import replicated as replicated_sharding

            lrepl = replicated_sharding(eval_mesh)
            eval_params, eval_stats = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), lrepl),
                (eval_params, eval_stats),
            )

        results: Dict[int, list] = {}
        seen = 0  # rank-local image counter for the no-meta id fallback
        meters = defaultdict(AverageMeter)
        oh, ow = cfg.MODEL.OUTPUT_SIZE
        viz = None
        if int(cfg.DEBUG) > 0 and self.dataset_val is not None and not multiproc:
            # first-val-sample overlays (WandbLogger analogue, logger.py:78-171)
            from ..utils.visualize import ValVisualizer

            viz = ValVisualizer(self.output_dir, cfg, self.dataset_val)
        for batch in loader:
            meta = batch.pop("meta", None)
            jbatch = shard_batch(batch, eval_mesh)
            nimg = batch["image"].shape[0]
            if meta is not None:
                centers = np.asarray(meta["center"], np.float32)
                scales = np.asarray(meta["scale"], np.float32)
            else:
                w = self.dataset_val.default_resolution[1]
                h = self.dataset_val.default_resolution[0]
                centers = np.tile(np.array([w / 2, h / 2], np.float32), (nimg, 1))
                scales = np.full((nimg,), max(h, w), np.float32)
            # per-image inverse matrices (reference postProcess.py:31-43)
            trans_mat = stack_inverse_transforms(centers, scales, (ow, oh))
            processed, loss, parts, pred_pc_hm = self._eval_step(
                eval_params, eval_stats, jbatch, trans_mat
            )
            meters["total"].update(float(loss))
            for k_, v in parts.items():
                meters[k_].update(float(v))
            if meta is not None:
                img_ids = np.asarray(meta["img_id"]).tolist()
            else:
                if multiproc and default_loader and self.dataset_val is not None:
                    # no-meta fallback under the default sharded loader:
                    # invert the unshuffled strided-pad index stream
                    # (pipeline.py _indices) so positions map to TRUE
                    # dataset indices — rank-local counters would repeat
                    # across ranks and collapse in the allgather merge, and
                    # synthetic ids would leak pad duplicates as extra images
                    pid, nproc = jax.process_index(), jax.process_count()
                    n = len(self.dataset_val)
                    m = -(-n // nproc)  # padded per-rank shard length
                    idxs = [int((pid + nproc * ((seen + i) % m)) % n)
                            for i in range(nimg)]
                else:
                    idxs = list(range(seen, seen + nimg))
                # dataset indices -> COCO image ids when the dataset exposes
                # them: run_eval/convert_eval_format key GT by the
                # converter-assigned (video,sensor)-reordered ids, so raw
                # indices would attribute detections to the wrong samples
                ids_map = (getattr(self.dataset_val, "images", None)
                           if default_loader and self.dataset_val is not None
                           else None)
                img_ids = ([ids_map[j] for j in idxs] if ids_map is not None
                           else idxs)
            seen += nimg
            # one tunnel transfer for all detection tensors (axon fetch
            # round trips otherwise dominate val wall time; detector.py)
            from .detector import _fetch_packed

            processed_np = _fetch_packed(processed)
            if multiproc:
                # merge ranks: ids ride in the same payload so rows and ids
                # stay paired (tiled allgather concatenates process shards in
                # process-index order on both)
                from jax.experimental.multihost_utils import process_allgather

                payload = dict(processed_np)
                payload["_img_ids"] = np.asarray(img_ids, np.int64)
                gathered = process_allgather(payload, tiled=True)
                img_ids = np.asarray(gathered.pop("_img_ids")).tolist()
                processed_np = {k: np.asarray(v) for k, v in gathered.items()}
            results.update(detections_to_results(processed_np, img_ids))
            if viz is not None and viz.image is None and meta is not None:
                img_id0 = int(img_ids[0])
                target_hm = batch.get("pc_hm")
                if target_hm is None and batch.get("pc_dep") is not None:
                    # display-normalized raw radar depth (d / max_dist)
                    target_hm = (
                        np.asarray(batch["pc_dep"])[..., :1]
                        / float(cfg.DATASET.MAX_PC_DIST)
                    )
                radar_pc = (
                    np.asarray(batch["pc_3d"][0]).T
                    if batch.get("pc_3d") is not None
                    else None
                )
                viz.add_ground_truth(
                    img_id0,
                    np.asarray(target_hm[0]) if target_hm is not None else None,
                )
                viz.add_predictions(
                    img_id0, results.get(img_id0, []),
                    pc_hm=(np.asarray(pred_pc_hm[0])
                           if pred_pc_hm is not None else None),
                    radar_pc=radar_pc,
                )

        if viz is not None:
            viz.save(epoch=len(self.history["val"].get("total", [])))
        for k_, m in meters.items():
            self.history["val"].setdefault(k_, []).append(m.avg)
        self.logger.info(
            "val %s", " ".join(f"{k} {m.avg:.4f}" for k, m in sorted(meters.items()))
        )
        self.metrics.scalars({k: m.avg for k, m in meters.items()}, prefix="val/")

        from ..parallel import is_main_process

        if (self.dataset_val is not None
                and hasattr(self.dataset_val, "run_eval")
                and is_main_process()):
            # rank-0-only scoring, like the reference (progressBar.py:293):
            # after the allgather merge every rank holds identical results,
            # and concurrent run_eval/metrics writes into the SAME
            # output_dir would race on mAR.csv / metrics files
            try:
                _, summaries = self.dataset_val.run_eval(results, self.output_dir)
                if summaries:
                    self.dataset_val.log_valid_result(self.logger, summaries)
                    best = summaries.get("range_all", {})
                    self.metrics.scalars(
                        {"mAP": best.get("mean_ap", 0.0),
                         "NDS": best.get("nd_score", 0.0)}, prefix="val/"
                    )
                    self.metrics.summary({"range_all": best})
            except Exception as e:  # scoring is best-effort (safe_run analogue)
                self.logger.warning("run_eval failed: %s", e)
        return results

    def test(self, loader: Optional[Loader] = None):
        return self.val(loader)

    def profile(self, sample_batch) -> Dict[str, float]:
        """FLOPs via XLA cost analysis (thop analogue, trainer.py:112-117)."""
        batch = jax.tree.map(jnp.asarray, sample_batch)

        def fwd(params, batch_stats, image, pc_hm, pc_dep, calib):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                image, pc_hm, pc_dep, calib, train=False,
            )

        return estimate_cost(
            fwd, self.state.params, self.state.batch_stats, batch["image"],
            batch.get("pc_hm"), batch.get("pc_dep"), batch.get("calib"),
        )
