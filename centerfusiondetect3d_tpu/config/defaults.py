"""Default configuration schema.

Mirrors the reference's option surface (/root/reference/src/lib/config/default.py:1-89)
so that users of the reference find every knob, while adding TPU-specific options
(mesh axes, bf16 policy, prefetch depth) that replace CUDA/Lightning settings.
"""

from .node import ConfigNode


def default_config() -> ConfigNode:
    c = ConfigNode()
    c.NAME = "CenterFusion"
    c.OUTPUT_DIR = "output"

    c.GPUS = (0,)  # kept for config-file compatibility; ignored (devices come from JAX)
    c.WORKERS = 2
    c.DEBUG = 0
    c.EVAL = False
    c.RANDOM_SEED = 0
    c.MIXED_PRECISION = True  # bfloat16 activations/compute on TPU
    c.CONF_THRESH = 0.3
    c.WANDB_RESUME = False
    c.WANDB_RESUBMIT = False

    c.DATASET = ConfigNode()
    c.DATASET.DATASET = "nuscenes"
    c.DATASET.ROOT = "data/"
    c.DATASET.RANDOM_CROP = False
    c.DATASET.MAX_CROP = True
    c.DATASET.SHIFT = 0.2
    c.DATASET.SCALE = 0.0
    c.DATASET.ROTATE = 0.0
    c.DATASET.FLIP = 0.5
    c.DATASET.COLOR_AUG = True
    c.DATASET.TRAIN_SPLIT = "train"
    c.DATASET.VAL_SPLIT = "mini_val"
    c.DATASET.RADAR_PC = True
    c.DATASET.MAX_PC = 1000
    c.DATASET.MAX_PC_DIST = 60.0
    c.DATASET.PC_Z_OFFSET = 0.0
    c.DATASET.PC_ROI_METHOD = "pillars"  # pillars | heatmap | points
    c.DATASET.PILLAR_DIMS = (1.5, 0.2, 0.2)
    c.DATASET.ONE_HOT_PC = False
    c.DATASET.DECOUPLE_REP = False
    c.DATASET.HEATMAP_REP = "2d"  # 2d | 3d

    c.MODEL = ConfigNode()
    c.MODEL.LOAD_DIR = ""
    c.MODEL.ARCH = "dla_34"
    c.MODEL.FREEZE_BACKBONE = False
    c.MODEL.NORM_EVAL = False
    c.MODEL.NORM_2D = False
    c.MODEL.DEFREEZE = -1
    c.MODEL.FUSION_STRATEGY = "middle"  # early | middle | None
    c.MODEL.FRUSTUM = True
    c.MODEL.K = 100
    # execute each stage's head towers through ONE wide 3x3 conv (per-head
    # tower_0 kernels concatenated at apply time; identical math and params).
    # Off by default: measured runtime-neutral on v5e (XLA already schedules
    # the small towers well) while ~3x-ing cold compile time of the model
    # program - keep as an opt-in for hardware where many small convs hurt.
    c.MODEL.FUSED_HEAD_TOWERS = False
    # TPU-native bucketed top-k (jax.lax.approx_max_k) for the per-class
    # spatial peak stage. Default ON: measured on the v5e it is bit-exact on
    # the decode golden fixtures and recalls 99-100% of the true top-100
    # peaks on serving-shape sparse heatmaps (112x200, 160 peaks/img; the
    # ~1 missed peak per image is a within-bin near-tie), for +4-5 fps
    # (decode's two full sorts leave the step's critical path). Set False
    # for the exact sort (strict reference semantics).
    c.MODEL.APPROX_TOPK = True
    c.MODEL.INPUT_SIZE = (448, 800)
    c.MODEL.DLA = ConfigNode()
    c.MODEL.DLA.NODE = "DeformConv"  # DeformConv | GlobalConv | Conv
    # deformable-sampling implementation: auto (tight-window shift on TPU
    # for eval AND both train phases — measured in PARITY.md; xla
    # elsewhere)
    # | shift (static shifted-window XLA, offsets clamped to ±DCN_MAX_OFFSET)
    # | select (4-corner select over the same static windows — identical
    # clamp semantics, ~2x fewer VPU ops, integer DCN_MAX_OFFSET only)
    # | shift_hybrid (shift + exact sparse correction of clamped pixels)
    # | xla (flattened-row gathers, exact, any backend) | pallas (Mosaic
    # kernel - single-kernel programs only on this image, kept for probes).
    c.MODEL.DLA.DCN_IMPL = "auto"
    # shift-impl offset clamp in output-stride pixels. R=1 runs ~2x faster
    # than the exact gather path at every DLA node shape (cost scales as
    # (2ceil(R)+1)^2); raise to 2.0 (gather-parity speed) or set DCN_IMPL=xla for
    # exact torchvision semantics, e.g. when importing reference checkpoints
    # whose trained offsets exceed +-1.
    c.MODEL.DLA.DCN_MAX_OFFSET = 1.0
    # shift_hybrid: fraction of output pixels (those with the largest
    # offsets) recomputed EXACTLY via sparse gathers and patched over the
    # shift result - makes the fast path safe when trained offsets
    # occasionally exceed DCN_MAX_OFFSET.
    c.MODEL.DLA.DCN_CORRECT_FRAC = 0.03
    # shift_hybrid candidate selection: True = jax.lax.approx_max_k (fast,
    # recall ~0.95 - a few overflowing pixels may keep shift accuracy), False
    # = exact top_k (the 'residual error only if more than DCN_CORRECT_FRAC
    # of pixels overflow' guarantee holds strictly).
    c.MODEL.DLA.DCN_CORRECT_APPROX = True
    # eval-time space-to-depth stem: run the full/half-res 3..32-channel stem
    # convs in s2d(2) space (exact weight reparameterization; MXU-dense
    # shapes, no layout-copy chains). Training always uses the plain stem.
    c.MODEL.DLA.S2D_STEM = True
    # deep DCN nodes (in_ch >= DCN_DEEP_MIN_CH) use this impl instead of
    # the plain clamped fast path: trained offsets at those nodes reach
    # p99 ~8 px (measured on the TPU overfit run, scripts/overfit_tpu.py)
    # while the shallow nodes stay within ~1.5 px. shift_hybrid exactly
    # recomputes the top DCN_CORRECT_FRAC largest-offset pixels — measured
    # ~3 fps vs all-shift (138.0 vs 141.2 at bs6 448x800), vs 25 fps for
    # full exact gathers at those nodes. '' disables the override.
    c.MODEL.DLA.DCN_DEEP_IMPL = "shift_hybrid"
    c.MODEL.DLA.DCN_DEEP_MIN_CH = 256

    c.LOSS_WEIGHTS = ConfigNode()
    c.LOSS_WEIGHTS.HEATMAP = 1.0
    c.LOSS_WEIGHTS.AMODAL_OFFSET = 1.0
    c.LOSS_WEIGHTS.DIMENSION_2D = 0.1
    c.LOSS_WEIGHTS.DEPTH = 1.0
    c.LOSS_WEIGHTS.DIMENSION_3D = 1.0
    c.LOSS_WEIGHTS.ROTATION = 1.0
    c.LOSS_WEIGHTS.NUSCENES_ATT = 1.0
    c.LOSS_WEIGHTS.VELOCITY = 1.0
    c.LOSS_WEIGHTS.BBOX_2D = 0.0
    c.LOSS_WEIGHTS.BBOX_3D = 0.0
    c.LOSS_WEIGHTS.LIDAR_DEPTH = 0.0
    c.LOSS_WEIGHTS.RADAR_DEPTH = 0.0

    c.TRAIN = ConfigNode()
    c.TRAIN.BATCH_SIZE = 26
    c.TRAIN.SHUFFLE = True
    c.TRAIN.EPOCHS = 60
    c.TRAIN.WARM_EPOCHS = 5
    c.TRAIN.RESUME = False
    c.TRAIN.OPTIMIZER = "adam"
    c.TRAIN.LR = 2.5e-4
    c.TRAIN.LR_STEP = (50,)
    c.TRAIN.SAVE_INTERVALS = 10
    c.TRAIN.VAL_INTERVALS = 10
    c.TRAIN.SCALE_FACTOR = 16
    c.TRAIN.LR_SCHEDULER = "StepLR"  # CLR | StepLR
    c.TRAIN.UNCERTAINTY_LOSS = False
    # microbatch gradient accumulation: split each TRAIN.BATCH_SIZE batch
    # into GRAD_ACCUM sequential microbatches under lax.scan and apply ONE
    # optimizer update with the gradient mean — large effective batches at
    # microbatch activation memory. DDP-rank semantics (per-microbatch loss
    # normalization, sequential BN stats); BATCH_SIZE must divide evenly.
    c.TRAIN.GRAD_ACCUM = 1
    # abort training after this many CONSECUTIVE non-finite total losses
    # (tolerance semantics of the reference's guarded logger,
    # logger.py:463-485); the last interval checkpoint stays the
    # recovery point — the diverged state is deliberately NOT saved.
    # 0 disables the guard.
    c.TRAIN.NONFINITE_TOLERANCE = 5

    c.TEST = ConfigNode()
    c.TEST.BATCH_SIZE = 1
    c.TEST.OFFICIAL_EVAL = False
    c.TEST.FLIP_TEST = False  # fused flip-averaging TTA (extension over reference)
    c.TEST.MULTI_SCALE = ()  # e.g. (0.75, 1.0, 1.25): multi-scale TTA scales
    # serving path: decode JPEGs at half resolution when the source is still
    # >= the network input (nuScenes 1600x900 -> 800x450 vs 800x448 input);
    # ~3x cheaper host decode. False = reference full-resolution decode.
    c.TEST.FAST_DECODE = True
    # largest per-program device batch for serving: bs>6 falls off an XLA
    # fusion cliff on v5e (temp memory 400 MiB -> 3.2 GiB, 112 -> 40 fps
    # measured at bs12 — the shift-DCN accumulations stop fusing); Detector
    # splits larger batches into sequential programs of this size. 0 = off.
    c.TEST.MAX_DEVICE_BATCH = 6
    # when the batch is a multiple of MAX_DEVICE_BATCH, run ONE program
    # that lax.maps the sub-batch forward instead of sequential programs:
    # per-iteration footprint stays at the fusion sweet spot and dispatch
    # is paid once. Measured v5e 448x800: bs24 map 4x6 = 228.2 fps vs bs6's
    # 213.3 and monolithic bs12's 191.1 (scripts/probe_batch_cliff.py).
    c.TEST.DEVICE_BATCH_MAP = True
    # serving path: paint the radar depth map ON DEVICE from compact
    # per-point (box, value) rows instead of shipping the dense raster —
    # bit-identical to the host paint (ops/rasterize.py docstring) and ~10x
    # fewer host->device bytes for the radar branch. Falls back to the host
    # raster for ONE_HOT_PC (per-bucket overwrite history is host-painted).
    c.TEST.DEVICE_RASTERIZE = True

    # --- TPU-native runtime options (replace GPUS/DDP/CUDNN sections) -------
    c.TPU = ConfigNode()
    c.TPU.MESH_DATA = -1  # -1: all available devices on the data axis
    c.TPU.MESH_MODEL = 1
    # shard image/feature HEIGHT over this many chips (XLA inserts the conv
    # halo exchanges); the CNN analogue of sequence parallelism. Use when a
    # resolution/batch is too large for one chip's HBM.
    c.TPU.MESH_SPATIAL = 1
    c.TPU.PREFETCH = 2  # host->device prefetch depth
    c.TPU.DONATE = True
    c.TPU.PLATFORM = ""  # force a jax platform (e.g. 'cpu'); '' = default
    c.TPU.DEBUG_NANS = False  # jax nan-guard (torch anomaly-mode analogue)
    c.TPU.PROFILE = False  # capture a jax.profiler trace of the first epoch
    c.TPU.REMAT = False  # rematerialize the backbone (fit bigger batches)
    return c
