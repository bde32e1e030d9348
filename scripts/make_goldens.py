"""Generate golden parity fixtures by RUNNING the torch reference.

Executes the reference implementation (/root/reference/src/lib) on seeded
synthetic inputs and saves input+output arrays as npz fixtures under
``tests/fixtures/``. The matching tests in ``tests/test_golden_parity.py``
skip unless a fixture exists, so parity against the actual reference is a
one-command procedure on any machine that has torch:

    python scripts/make_goldens.py [--ref /path/to/reference/src/lib]
                                   [--out tests/fixtures]

Components needing only CPU torch (decode, loss primitives, LR schedule,
Conv+BN stats) generate everywhere; the DCN golden additionally needs
torchvision and is skipped with a notice when it is absent. Modules that
the reference imports but never touches in these paths (nuscenes devkit,
pyquaternion) are stubbed.
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Stub the devkit imports losses.py pulls in transitively but does not
    execute in the loss paths we capture."""
    _stub("nuscenes")
    _stub("nuscenes.utils")

    class _RadarPointCloudStub:
        """Placeholder devkit class. Must NOT be ``object``:
        map_pointcloud_to_image does isinstance(pc, RadarPointCloud), and
        with ``object`` every ndarray would match."""

    def _view_points(points, view, normalize):
        """Faithful devkit geometry_utils.view_points (public semantics)."""
        viewpad = np.eye(4)
        viewpad[: view.shape[0], : view.shape[1]] = view
        nbr = points.shape[1]
        pts = np.concatenate((points, np.ones((1, nbr))))
        pts = viewpad @ pts
        pts = pts[:3, :]
        if normalize:
            pts = pts / pts[2:3, :].repeat(3, 0).reshape(3, nbr)
        return pts

    _stub("nuscenes.utils.data_classes", RadarPointCloud=_RadarPointCloudStub)
    _stub(
        "nuscenes.utils.geometry_utils",
        view_points=_view_points,
        transform_matrix=lambda *a, **k: None,
    )
    _stub("pyquaternion", Quaternion=object)

    class _CN(dict):
        """Minimal yacs.CfgNode: attribute-style dict with no-op freeze."""

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

        def defrost(self):
            return self

        def freeze(self):
            return self

        def dump(self):
            return ""

    try:
        import yacs  # noqa: F401
    except ImportError:
        _stub("yacs")
        _stub("yacs.config", CfgNode=_CN)
    _stub("lightning")
    _stub("lightning.pytorch")
    _stub("lightning.pytorch.utilities",
          rank_zero_only=lambda fn, *a, **k: fn)
    _stub("lightning.pytorch.loggers", WandbLogger=object)
    def _tv_deform_conv2d(input=None, offset=None, weight=None, bias=None,
                          stride=(1, 1), padding=(1, 1), dilation=(1, 1),
                          mask=None):
        """torchvision.ops.deform_conv2d replacement via grid_sample —
        mathematically identical for the 3x3/stride-1/pad-1 case the
        reference uses (dla.py:461-470)."""
        import torch as _torch

        def _pair(v):
            return (v, v) if isinstance(v, int) else tuple(v)

        assert _pair(stride) == (1, 1) and _pair(dilation) == (1, 1)
        assert _pair(padding) == (1, 1) and weight.shape[-2:] == (3, 3)
        if bias is None:
            bias = _torch.zeros(weight.shape[0])
        return _torch_dcn_gridsample(_torch, input, offset, mask, weight,
                                     bias)

    try:
        import torchvision  # noqa: F401
    except ImportError:
        # model/__init__.py imports dla.py which imports torchvision at
        # module scope; the stub's deform_conv2d is the grid_sample
        # formulation so the DeformConv model path runs for real
        tv = _stub("torchvision")
        tv.__stub__ = True
        _stub("torchvision.ops", deform_conv2d=_tv_deform_conv2d)

        class _TvNoop:
            """transforms placeholder: only instantiated in __init__ paths
            the generators bypass (dataset instances via __new__)."""

            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        _stub(
            "torchvision.transforms",
            ColorJitter=_TvNoop, Normalize=_TvNoop, Lambda=_TvNoop,
            Compose=_TvNoop, RandomOrder=_TvNoop, ToTensor=_TvNoop,
        )

    try:
        import pycocotools  # noqa: F401
    except ImportError:
        # generic_dataset imports pycocotools.coco at module scope; only
        # __init__ (bypassed via __new__) ever constructs COCO
        _stub("pycocotools")
        _stub("pycocotools.coco", COCO=object)

    # dataset/datasets/nuscenes.py module-scope devkit imports (none are
    # executed by the generators, which drive addInstance/processPointCloud)
    _stub("nuscenes.nuscenes", NuScenes=object)
    # add BoxVisibility to the existing geometry_utils stub WITHOUT
    # replacing it (the faithful view_points above must survive)
    sys.modules["nuscenes.utils.geometry_utils"].BoxVisibility = object
    sys.modules["nuscenes.utils.data_classes"].Box = object
    _stub("nuscenes.eval")
    _stub("nuscenes.eval.common")
    _stub("nuscenes.eval.common.data_classes", EvalBoxes=object)
    _stub("nuscenes.eval.detection")
    _stub("nuscenes.eval.detection.data_classes", DetectionBox=object)
    _stub(
        "nuscenes.eval.common.loaders",
        load_gt=lambda *a, **k: None,
        add_center_dist=lambda *a, **k: None,
        filter_eval_boxes=lambda *a, **k: None,
    )
    _stub("nuscenes.eval.detection.render",
          visualize_sample=lambda *a, **k: None)
    _stub("nuscenes.eval.common.config",
          config_factory=lambda *a, **k: None)
    _stub("nuscenes.eval.detection.utils",
          category_to_detection_name=lambda *a, **k: None)


def gen_decode(torch, out_dir):
    from model.decode import fusionDecode

    rs = np.random.RandomState(42)
    b, c, h, w, k = 2, 10, 16, 24, 8

    def heads(seed, secondary=False):
        r = np.random.RandomState(seed)
        d = {
            "heatmap": 1 / (1 + np.exp(-r.randn(b, c, h, w))),
            "reg": r.randn(b, 2, h, w),
            "widthHeight": np.abs(r.randn(b, 2, h, w)) * 4,
            "depth": np.abs(r.randn(b, 1, h, w)) * 20,
            "rotation": r.randn(b, 8, h, w),
            "dimension": np.abs(r.randn(b, 3, h, w)) + 0.5,
            "amodal_offset": r.randn(b, 2, h, w),
            "nuscenes_att": r.randn(b, 8, h, w),
            "velocity": r.randn(b, 3, h, w),
        }
        if secondary:
            d["depth2"] = np.abs(r.randn(b, 1, h, w)) * 20
            d["rotation2"] = r.randn(b, 8, h, w)
            d["uncertainty"] = r.randn(b, 1, h, w)
        return {key: v.astype(np.float32) for key, v in d.items()}

    for name, layers in [
        ("decode_single_layer", [heads(1, secondary=True)]),
        ("decode_two_layer", [heads(2), heads(3)]),
        # uncertainty in BOTH layers: pins the reference's per-layer score
        # multiplication at each layer's own (unmerged) top-k indices
        # (decode.py:79-85 — the conf rows are misaligned with the merged
        # order, reproduced verbatim)
        ("decode_two_layer_unc", [heads(4, secondary=True),
                                  heads(5, secondary=True)]),
    ]:
        t_layers = [
            {k2: torch.from_numpy(v) for k2, v in lay.items()} for lay in layers
        ]
        ret = fusionDecode(t_layers, outputSize=(h, w), K=k, norm2d=False)
        blob = {}
        for i, lay in enumerate(layers):
            for k2, v in lay.items():
                blob[f"in{i}_{k2}"] = v
        for k2, v in ret.items():
            blob[f"out_{k2}"] = v.detach().numpy()
        blob["meta_hwk"] = np.array([h, w, k])
        np.savez(os.path.join(out_dir, f"{name}.npz"), **blob)
        print(f"wrote {name}.npz ({len(blob)} arrays)")


def gen_losses(torch, out_dir):
    import model.losses as L

    rs = np.random.RandomState(7)
    b, c, h, w, m = 2, 10, 16, 24, 12
    hw = h * w

    out = 1 / (1 + np.exp(-rs.randn(b, c, h, w).astype(np.float32) * 2))
    target = np.zeros((b, c, h, w), np.float32)
    ind = rs.randint(0, hw, (b, m)).astype(np.int64)
    cat = rs.randint(0, c, (b, m)).astype(np.int64)
    mask = (rs.rand(b, m) > 0.3).astype(np.float32)
    # plant gaussian-ish peaks at the annotated indices
    for bi in range(b):
        for mi in range(m):
            if mask[bi, mi]:
                target[bi, cat[bi, mi]].flat[ind[bi, mi]] = 1.0

    t = lambda x: torch.from_numpy(np.asarray(x))
    blob = dict(out=out, target=target, ind=ind, cat=cat, mask=mask)

    blob["out_focal"] = (
        L.FastFocalLoss()(t(out), t(target), t(ind), t(mask), t(cat)).numpy()
    )

    reg_out = rs.randn(b, 3, h, w).astype(np.float32)
    reg_target = rs.randn(b, m, 3).astype(np.float32)
    reg_mask = np.repeat(mask[..., None], 3, axis=2).astype(np.float32)
    blob.update(reg_out=reg_out, reg_target=reg_target, reg_mask=reg_mask)
    blob["out_regl1"] = (
        L.RegWeightedL1Loss()(t(reg_out), t(reg_mask), t(ind), t(reg_target)).numpy()
    )

    att_out = rs.randn(b, 8, h, w).astype(np.float32)
    att_target = (rs.rand(b, m, 8) > 0.5).astype(np.float32)
    att_mask = np.repeat(mask[..., None], 8, axis=2).astype(np.float32)
    blob.update(att_out=att_out, att_target=att_target, att_mask=att_mask)
    blob["out_wbce"] = (
        L.WeightedBCELoss()(t(att_out), t(att_mask), t(ind), t(att_target)).numpy()
    )

    rot_out = rs.randn(b, 8, h, w).astype(np.float32)
    rotbin = rs.randint(0, 2, (b, m, 2)).astype(np.int64)
    rotres = (rs.randn(b, m, 2) * 0.4).astype(np.float32)
    rot_mask = mask[..., None].astype(np.float32)
    blob.update(rot_out=rot_out, rotbin=rotbin, rotres=rotres, rot_mask=rot_mask)
    blob["out_binrot"] = (
        L.BinRotLoss()(t(rot_out), t(rot_mask), t(ind), t(rotbin), t(rotres)).numpy()
    )

    dep_out = np.abs(rs.randn(b, 1, h, w).astype(np.float32)) * 10
    dep_target = np.abs(rs.randn(b, m, 1).astype(np.float32)) * 10
    unc_out = rs.randn(b, 1, h, w).astype(np.float32)
    dep_mask = mask[..., None].astype(np.float32)
    blob.update(dep_out=dep_out, dep_target=dep_target, unc_out=unc_out,
                dep_mask=dep_mask)
    l, ul = L.UncertaintyDepthLoss()(
        t(dep_out), t(dep_mask), t(ind), t(dep_target), t(unc_out)
    )
    blob["out_unc_l1"] = l.numpy()
    blob["out_unc_unc"] = ul.numpy()

    trunc = (rs.rand(b, m, 1) > 0.7).astype(np.float32)
    blob["trunc"] = trunc
    blob["out_decoupled"] = (
        L.DecoupledLoss()(
            t(dep_out), t(dep_mask), t(ind), t(dep_target), t(trunc)
        ).numpy()
    )

    boxes_p = rs.rand(b, m, 4).astype(np.float32) * 30
    boxes_p[..., 2:] += boxes_p[..., :2]
    boxes_t = boxes_p + rs.randn(b, m, 4).astype(np.float32) * 2
    boxes_t[..., 2:] = np.maximum(boxes_t[..., 2:], boxes_t[..., :2] + 1)
    blob.update(boxes_p=boxes_p, boxes_t=boxes_t)
    blob["out_giou"] = L.GIoU2DLoss()(t(boxes_p), t(boxes_t), t(mask)).numpy()

    np.savez(os.path.join(out_dir, "losses.npz"), **blob)
    print(f"wrote losses.npz ({len(blob)} arrays)")


def gen_schedule(torch, out_dir):
    """Torch LR-schedule traces built EXACTLY as the reference composes its
    StepLR scheduler (modelWithLoss.py:129-193: SequentialLR of warmup
    LambdaLR + MultiStepLR segments split at DEFREEZE)."""
    from torch.optim.lr_scheduler import (
        LambdaLR,
        MultiStepLR,
        SequentialLR,
    )

    base_lr = 2.5e-4

    def trace(warm, defreeze, steps, start_epoch, epochs=80):
        net = torch.nn.Linear(4, 4)
        opt = torch.optim.Adam(net.parameters(), lr=base_lr)
        warmup_factor = lambda step: 0.5 ** (warm - step)
        schedulers, milestones = [], []
        if warm:
            schedulers.append(LambdaLR(opt, lr_lambda=warmup_factor))
            milestones.append(warm)
        if defreeze > start_epoch:
            milestones2 = [
                s - start_epoch - warm for s in steps if s < defreeze
            ]
            schedulers.append(MultiStepLR(opt, milestones=milestones2,
                                          gamma=0.1))
            milestones.append(defreeze - start_epoch)
            if warm:
                schedulers.append(LambdaLR(opt, lr_lambda=warmup_factor))
                milestones.append(defreeze + warm - start_epoch)
        s4 = [
            s - warm - max(defreeze, start_epoch)
            for s in steps
            if s >= defreeze
        ]
        schedulers.append(MultiStepLR(opt, milestones=s4, gamma=0.1))
        sched = SequentialLR(opt, schedulers, milestones=milestones)
        lrs = []
        for _ in range(epochs):
            lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        return np.array(lrs, np.float64)

    np.savez(
        os.path.join(out_dir, "schedule.npz"),
        base_lr=np.float64(base_lr),
        warm_only=trace(warm=5, defreeze=-1, steps=(50, 70), start_epoch=0),
        warm_defreeze=trace(warm=5, defreeze=10, steps=(50, 70),
                            start_epoch=0),
        no_warm=trace(warm=0, defreeze=-1, steps=(50, 70), start_epoch=0),
    )
    print("wrote schedule.npz")


def gen_convbn(torch, out_dir):
    """Conv2d + BatchNorm2d(momentum=0.1) goldens: train-mode output,
    updated running stats after 3 steps, and eval-mode output — validates
    the flax BN parity (momentum/eps/bias conventions)."""
    rs = np.random.RandomState(3)
    conv = torch.nn.Conv2d(6, 8, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8, momentum=0.1, eps=1e-5)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            rs.randn(8, 6, 3, 3).astype(np.float32) * 0.2))
        bn.weight.copy_(torch.from_numpy(
            np.abs(rs.randn(8)).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rs.randn(8).astype(np.float32)))

    xs = [rs.randn(2, 6, 10, 12).astype(np.float32) for _ in range(3)]
    outs = []
    conv.train(); bn.train()
    with torch.no_grad():
        for x in xs:
            outs.append(bn(conv(torch.from_numpy(x))).numpy())
    conv.eval(); bn.eval()
    with torch.no_grad():
        eval_out = bn(conv(torch.from_numpy(xs[0]))).numpy()
    np.savez(
        os.path.join(out_dir, "convbn.npz"),
        conv_w=conv.weight.detach().numpy(),
        bn_w=bn.weight.detach().numpy(),
        bn_b=bn.bias.detach().numpy(),
        x0=xs[0], x1=xs[1], x2=xs[2],
        out0=outs[0], out1=outs[1], out2=outs[2],
        running_mean=bn.running_mean.numpy(),
        running_var=bn.running_var.numpy(),
        eval_out=eval_out,
    )
    print("wrote convbn.npz")


def _torch_dcn_gridsample(torch, x, offset, mask, weight, bias):
    """Pure-torch DCNv2 forward via per-tap ``grid_sample``.

    Mathematically identical to ``torchvision.ops.deform_conv2d`` with
    3x3/stride-1/padding-1 (bilinear sampling, zeros outside the image,
    modulation mask, per-tap contraction): ``align_corners=True`` maps
    grid -1/+1 exactly onto pixel 0/size-1, so fractional pixel coords
    round-trip without the half-pixel shift of the default mode.
    """
    import torch.nn.functional as F

    b, c, h, w = x.shape
    o = weight.shape[0]
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    out = torch.zeros(b, o, h, w)
    for k in range(9):
        i, j = divmod(k, 3)
        py = ys[None] + (i - 1) + offset[:, 2 * k]
        px = xs[None] + (j - 1) + offset[:, 2 * k + 1]
        grid = torch.stack(
            [2 * px / (w - 1) - 1, 2 * py / (h - 1) - 1], dim=-1
        )  # (B, H, W, 2), xy order
        samp = F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=True)
        samp = samp * mask[:, k:k + 1]
        out = out + torch.einsum("bchw,oc->bohw", samp, weight[:, :, i, j])
    return out + bias[None, :, None, None]


def gen_dcn(torch, out_dir):
    """DCNv2 golden: torchvision when present, else the pure-torch
    grid_sample formulation (bit-matches torchvision's op semantics)."""
    try:
        import torchvision

        from torchvision.ops import deform_conv2d as tv_dcn

        if getattr(torchvision, "__stub__", False):
            tv_dcn = None
    except ImportError:
        tv_dcn = None
    rs = np.random.RandomState(11)
    b, c, o, h, w = 2, 8, 16, 12, 14
    x = rs.randn(b, c, h, w).astype(np.float32)
    offset = (rs.randn(b, 18, h, w) * 2).astype(np.float32)
    mask = rs.rand(b, 9, h, w).astype(np.float32)
    weight = (rs.randn(o, c, 3, 3) * 0.2).astype(np.float32)
    bias = rs.randn(o).astype(np.float32)
    t = torch.from_numpy
    if tv_dcn is not None:
        out = tv_dcn(t(x), t(offset), t(weight), t(bias), padding=(1, 1),
                     mask=t(mask)).numpy()
        source = "torchvision"
    else:
        with torch.no_grad():
            out = _torch_dcn_gridsample(
                torch, t(x), t(offset), t(mask), t(weight), t(bias)
            ).numpy()
        source = "grid_sample"
    np.savez(os.path.join(out_dir, "dcn.npz"), x=x, offset=offset, mask=mask,
             weight=weight, bias=bias, out=out)
    print(f"wrote dcn.npz (source: {source})")


def gen_frustum(torch, out_dir):
    """Frustum-association goldens by EXECUTING the reference
    ``getPcFrustumHeatmap`` / ``cvtPcDepthToHeatmap``
    (/root/reference/src/lib/utils/pointcloud.py:331-481) — pure torch+numpy,
    so they generate in-image. Two fixtures:

    * ``frustum_full.npz`` — the whole top-K association from first-stage
      head maps (exercises the reference's topk + gather + distance-thresh
      chain) on crafted peaks: corner boxes with negative crop bounds, boxes
      beyond the image, a huge all-image box, out-of-range depths, negative
      widthHeight (clamped), overlapping paint rects, and a min-depth tie.
    * ``frustum_cases.npz`` — direct per-box ``cvtPcDepthToHeatmap`` calls
      pinning the python-slice wraparound semantics (negative starts/stops),
      each on a fresh canvas plus one sequential overwrite-order run.
    """
    import utils.pointcloud as pc
    from config import config

    t = torch.from_numpy
    rs = np.random.RandomState(23)
    b, c, h, w, K = 2, 10, 16, 24, 16
    max_dist = 60.0
    config.defrost()
    config.MODEL.K = K
    config.DATASET.MAX_PC_DIST = max_dist

    # sparse radar map [depth, vel_x, vel_z]
    pc_dep = np.zeros((b, 3, h, w), np.float32)
    for bi in range(b):
        n = 70
        ys_, xs_ = rs.randint(0, h, n), rs.randint(0, w, n)
        pc_dep[bi, 0, ys_, xs_] = rs.uniform(1.0, 65.0, n)
        pc_dep[bi, 1, ys_, xs_] = rs.randn(n)
        pc_dep[bi, 2, ys_, xs_] = rs.randn(n)
    # deliberate duplicated-minimum tie (argmin must pick the first in
    # crop-row-major order)
    pc_dep[0, 0, 3, 2] = pc_dep[0, 0, 3, 5] = 12.5
    pc_dep[0, 1, 3, 2], pc_dep[0, 1, 3, 5] = 0.7, -0.7

    heatmap = (1 / (1 + np.exp(-rs.randn(b, c, h, w) * 2))).astype(np.float32) * 0.5
    wh = (np.abs(rs.randn(b, 2, h, w)) * 6).astype(np.float32)
    depth = (np.abs(rs.randn(b, 1, h, w)) * 25 + 1).astype(np.float32)
    dim = (np.abs(rs.randn(b, 3, h, w)) + 0.5).astype(np.float32)
    rot = rs.randn(b, 8, h, w).astype(np.float32)

    peaks = [  # (y, x, box_w, box_h, depth)
        (3, 3, 6.0, 5.0, 12.0),     # covers the tie region
        (0, 0, 8.0, 7.0, 20.0),     # top-left: negative crop bounds (wrap)
        (15, 23, 9.0, 9.0, 30.0),   # bottom-right: x2/y2 beyond the image
        (8, 12, 40.0, 28.0, 25.0),  # huge box spanning everything
        (5, 20, 4.0, 3.0, 200.0),   # depth outside radar range: no match
        (10, 5, -3.0, 4.0, 15.0),   # negative width (clamped to 0)
        (12, 8, 5.0, 4.0, 10.0),    # overlapping paint rect ...
        (12, 10, 6.0, 5.0, 40.0),   # ... overwritten by this later box
    ]
    score = 0.99
    for bi in range(b):
        for (py, px, pw, ph, pd) in peaks:
            cls = rs.randint(0, c)
            heatmap[bi, cls, py, px] = score
            score -= 0.004
            wh[bi, 0, py, px], wh[bi, 1, py, px] = pw, ph
            depth[bi, 0, py, px] = pd

    calib = np.tile(
        np.array([[400.0, 0, w * 2.0, 0], [0, 400.0, h * 2.0, 0], [0, 0, 1, 0]],
                 np.float32), (b, 1, 1))
    with torch.no_grad():
        out = pc.getPcFrustumHeatmap(
            {"heatmap": t(heatmap), "widthHeight": t(wh.copy()),
             "depth": t(depth), "dimension": t(dim), "rotation": t(rot)},
            t(pc_dep.copy()), t(calib), config)
    np.savez(os.path.join(out_dir, "frustum_full.npz"),
             heatmap=heatmap, widthHeight=wh, depth=depth, dimension=dim,
             rotation=rot, pc_dep=pc_dep, calib=calib,
             out_pc_hm=out.numpy(),
             meta=np.array([K, max_dist], np.float64))
    print("wrote frustum_full.npz")

    # ---- direct cvtPcDepthToHeatmap cases (python-slice wraparound pinning)
    H2, W2 = 12, 20
    pcd = np.zeros((3, H2, W2), np.float32)
    n = 50
    ys_, xs_ = rs.randint(0, H2, n), rs.randint(0, W2, n)
    pcd[0, ys_, xs_] = rs.uniform(1.0, 55.0, n)
    pcd[1, ys_, xs_] = rs.randn(n)
    pcd[2, ys_, xs_] = rs.randn(n)
    pcd[0, 2, 3] = pcd[0, 2, 7] = 9.0  # tie
    cases = [  # (bbox xyxy, depth, thresh)
        ([2.2, 3.1, 8.7, 9.9], 15.0, 12.0),     # ordinary interior box
        ([-4.0, 2.0, 3.0, 8.0], 10.0, 8.0),     # x1<0: crop wraps (empty-ish)
        ([1.0, -6.0, 7.0, -1.5], 20.0, 10.0),   # fully above: empty crop
        ([-16.0, 1.0, 18.0, 9.0], 10.0, 9.0),   # match, paint start wraps neg
        ([-25.0, 0.0, 5.0, 11.0], 10.0, 9.0),   # match, paint slice wraps to
                                                # a non-empty mid-row band
        ([14.0, 6.0, 26.0, 13.0], 30.0, 25.0),  # x2/y2 beyond image (clamped)
        ([4.0, 4.0, 11.0, 10.0], 2.0, 1.0),     # window floor max(0, d-thr)
        ([0.0, 0.0, 19.0, 11.0], 9.0, 3.0),     # full-image box, hits tie
    ]
    singles = []
    with torch.no_grad():
        for bbox, d, thr in cases:
            canvas = torch.zeros(3, H2, W2)
            pc.cvtPcDepthToHeatmap(canvas, t(pcd.copy()), torch.tensor([d]),
                                   torch.tensor(bbox), torch.tensor(thr),
                                   max_dist)
            singles.append(canvas.numpy())
        seq = torch.zeros(3, H2, W2)
        for bbox, d, thr in cases:
            pc.cvtPcDepthToHeatmap(seq, t(pcd.copy()), torch.tensor([d]),
                                   torch.tensor(bbox), torch.tensor(thr),
                                   max_dist)
    np.savez(os.path.join(out_dir, "frustum_cases.npz"),
             pc_dep=pcd,
             bboxes=np.array([cs[0] for cs in cases], np.float32),
             depths=np.array([cs[1] for cs in cases], np.float32),
             threshs=np.array([cs[2] for cs in cases], np.float32),
             out_single=np.stack(singles),
             out_sequential=seq.numpy(),
             max_dist=np.float64(max_dist))
    print(f"wrote frustum_cases.npz ({len(cases)} cases)")


def gen_geometry(torch, out_dir):
    """2D/3D geometry goldens by EXECUTING the reference ``utils/image.py``
    and ``utils/ddd.py`` (+ ``pointcloud.get_alpha/cvtAlphaToYaw``) — pure
    numpy/cv2/torch, so they generate in-image. Pins the affine 3-point
    construction (incl. rotation/shift/inverse), point transforms, the
    CornerNet radius quadratics, circular AND elliptical gaussian splats
    (with border clipping), 3D box corners, projection/unprojection, and the
    alpha<->yaw conversions."""
    from utils.image import (
        getAffineTransform,
        affineTransform,
        getGaussianRadius,
        drawGaussianHeatRegion,
    )
    from utils import ddd
    import utils.pointcloud as pc

    rs = np.random.RandomState(11)
    blob = {}

    # ---- affine matrices: (center, scale(2,), rot deg, out (w,h), shift,
    # inverse) including rotation, anisotropic scale, shift and inverse
    cases = [
        ([800.0, 450.0], [1600.0, 1600.0], 0.0, [200, 112], [0.0, 0.0], 0),
        ([800.0, 450.0], [1600.0, 900.0], 0.0, [800, 448], [0.0, 0.0], 0),
        ([812.3, 430.7], [1531.9, 1531.9], 0.0, [200, 112], [0.0, 0.0], 0),
        ([800.0, 450.0], [1600.0, 1600.0], 0.0, [200, 112], [0.0, 0.0], 1),
        ([640.0, 360.0], [1280.0, 1280.0], 7.5, [160, 96], [0.0, 0.0], 0),
        ([640.0, 360.0], [1280.0, 1280.0], -13.0, [160, 96], [0.0, 0.0], 1),
        ([512.0, 300.0], [1024.0, 512.0], 0.0, [128, 64], [0.1, -0.05], 0),
        ([512.0, 300.0], [900.0, 900.0], 30.0, [100, 56], [-0.2, 0.15], 1),
    ]
    mats = [
        getAffineTransform(np.array(c, np.float32), np.array(s, np.float32),
                           r, o, shift=np.array(sh, np.float32),
                           inverse=bool(inv))
        for c, s, r, o, sh, inv in cases
    ]
    blob["affine_centers"] = np.array([c[0] for c in cases], np.float32)
    blob["affine_scales"] = np.array([c[1] for c in cases], np.float32)
    blob["affine_rots"] = np.array([c[2] for c in cases], np.float32)
    blob["affine_outs"] = np.array([c[3] for c in cases], np.int64)
    blob["affine_shifts"] = np.array([c[4] for c in cases], np.float32)
    blob["affine_inv"] = np.array([c[5] for c in cases], np.int64)
    blob["affine_mats"] = np.stack(mats)
    # scalar-scale path (reference wraps scalars itself)
    blob["affine_scalar_mat"] = getAffineTransform(
        np.array([800.0, 450.0], np.float32), 1600.0, 0.0, [200, 112]
    )

    # ---- point transform through each matrix (numpy and torch paths)
    pts = (rs.rand(17, 2) * np.array([1600, 900])).astype(np.float32)
    blob["points"] = pts
    blob["points_out"] = np.stack(
        [affineTransform(pts.copy(), m.astype(np.float32)) for m in mats]
    )
    blob["points_out_torch"] = np.stack(
        [affineTransform(torch.from_numpy(pts.copy()),
                         m.astype(np.float32)).numpy() for m in mats]
    )

    # ---- CornerNet gaussian radius
    det_sizes = np.array(
        [[24.0, 24.0], [3.0, 50.0], [50.0, 3.0], [1.0, 1.0], [112.0, 200.0],
         [7.3, 12.9], [0.4, 0.8]], np.float32)
    overlaps = np.array([0.7, 0.7, 0.3, 0.9, 0.5, 0.7, 0.7], np.float32)
    blob["radius_det_sizes"] = det_sizes
    blob["radius_overlaps"] = overlaps
    blob["radius_out"] = np.array(
        [getGaussianRadius((h_, w_), ov)
         for (h_, w_), ov in zip(det_sizes, overlaps)], np.float64)

    # ---- gaussian splats: circular ints (border clipping + overwrite-max)
    H, W = 20, 32
    circ = np.zeros((H, W), np.float32)
    circ_cases = [  # (cx, cy, radius, k)
        (10.0, 8.0, 3, 1.0),
        (11.5, 8.9, 2, 1.0),     # int-cast center
        (0.0, 0.0, 4, 1.0),      # top-left clip
        (31.0, 19.0, 5, 1.0),    # bottom-right clip
        (30.9, 3.2, 0, 1.0),     # radius 0
        (15.0, 15.0, 6, 0.5),    # k scaling
    ]
    for cx, cy, r, k in circ_cases:
        drawGaussianHeatRegion(circ, np.array([cx, cy], np.float32), int(r),
                               k=k)
    blob["circ_cases"] = np.array(circ_cases, np.float32)
    blob["circ_out"] = circ
    # elliptical (tuple radius — MonoFlex out-of-view path)
    ellip = np.zeros((H, W), np.float32)
    ellip_cases = [
        (6.0, 6.0, 4, 2, 1.0),
        (0.0, 10.0, 3, 5, 1.0),   # left-edge clip
        (31.0, 0.0, 2, 4, 1.0),   # corner clip
        (20.0, 12.0, 5, 1, 1.0),
    ]
    for cx, cy, rx, ry, k in ellip_cases:
        drawGaussianHeatRegion(ellip, np.array([cx, cy], np.float32),
                               (int(rx), int(ry)), k=k)
    blob["ellip_cases"] = np.array(ellip_cases, np.float32)
    blob["ellip_out"] = ellip

    # ---- 3D geometry (ddd.py)
    B, K = 2, 6
    dim = (np.abs(rs.randn(B, K, 3)) + 0.4).astype(np.float32)
    loc = (rs.randn(B, K, 3) * np.array([8, 1.5, 20]) +
           np.array([0, 1, 30])).astype(np.float32)
    yaw = (rs.rand(B, K) * 2 * np.pi - np.pi).astype(np.float32)
    corners = ddd.get3dBox(dim, loc, yaw)  # (B, K, 8, 3) numpy
    blob["ddd_dim"], blob["ddd_loc"], blob["ddd_yaw"] = dim, loc, yaw
    blob["ddd_corners"] = corners.astype(np.float32)

    calib = np.tile(
        np.array([[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0],
                  [0, 0, 1, 0]], np.float32), (B, 1, 1))
    calib_bk = np.tile(calib[:, None], (1, K, 1, 1))  # (B, K, 3, 4)
    blob["ddd_calib"] = calib
    blob["ddd_proj2d"] = ddd.project3DPoints(
        corners.astype(np.float32), calib_bk).astype(np.float32)

    # alpha -> rot_y with wrap cases (values near ±pi)
    alpha = np.array([[0.1, 3.1, -3.1, 1.5, -1.5, 0.0]] * B, np.float32)
    xs = (rs.rand(B, K) * 1600).astype(np.float32)
    rot_y = ddd.alpha2rot_y(alpha.copy(), xs, calib_bk[:, :, 0, 2],
                            calib_bk[:, :, 0, 0])
    blob["ddd_alpha"], blob["ddd_xs"] = alpha, xs
    blob["ddd_rot_y"] = rot_y

    # unprojection (torch path: cvtImgToCamCoord mutates + views)
    centers2d = (rs.rand(B, K, 2) * np.array([1600, 900])).astype(np.float32)
    depth = (rs.rand(B, K) * 50 + 1).astype(np.float32)
    t = torch.from_numpy
    locs_t, yaws_t = ddd.cvtImgToCamCoord(
        t(centers2d.copy()), t(alpha.copy()), t(dim.copy()),
        t(depth.copy()), t(calib.copy()))
    blob["ddd_centers2d"], blob["ddd_depth"] = centers2d, depth
    blob["ddd_cam_locs"] = locs_t.numpy()
    blob["ddd_cam_yaws"] = yaws_t.numpy()

    # get_alpha / cvtAlphaToYaw (pointcloud.py:195-236)
    rot8 = rs.randn(B, K, 8).astype(np.float32)
    blob["rot8"] = rot8
    blob["rot8_alpha"] = pc.get_alpha(t(rot8)).numpy()
    blob["alpha_yaw"] = pc.cvtAlphaToYaw(
        t(alpha.copy()), t(xs), t(calib_bk[:, :, 0, 2].copy()),
        t(calib_bk[:, :, 0, 0].copy())).numpy()

    np.savez(os.path.join(out_dir, "geometry.npz"), **blob)
    print(f"wrote geometry.npz ({len(blob)} arrays)")


def gen_postprocess(torch, out_dir):
    """postProcess goldens by EXECUTING the reference
    (/root/reference/src/lib/utils/postProcess.py:13-85) on seeded
    decode-style outputs: inverse-affine box/center mapping, 8-bin alpha,
    amodal-center vs bbox-mean center paths, unprojection, yaw-aligned
    velocity, 3D corners with non-positive-dimension zeroing, and the
    ``isGt`` branch."""
    from utils.postProcess import postProcess

    rs = np.random.RandomState(31)
    t = torch.from_numpy
    B, K = 2, 10
    oh, ow = 14, 25  # output plane
    center = np.array([800.0, 450.0], np.float32)
    scale = 1600.0

    centers = rs.rand(B, K, 2).astype(np.float32)  # normalized, as decode
    wh = (np.abs(rs.randn(B, K, 2)) * 5 + 1).astype(np.float32)
    cxy = centers * np.array([ow, oh], np.float32)
    bboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    dim = (np.abs(rs.randn(B, K, 3)) + 0.3).astype(np.float32)
    dim[0, 3] = [0.0, 1.0, 1.0]   # non-positive dims -> bboxes3d zeroed
    dim[1, 7] = [-0.5, 2.0, 1.0]
    inputs = {
        "scores": rs.rand(B, K).astype(np.float32),
        "classIds": rs.randint(0, 10, (B, K)).astype(np.float32),
        "centers": centers,
        "bboxes": bboxes,
        "depth": (rs.rand(B, K, 1) * 50 + 1).astype(np.float32),
        "rotation": rs.randn(B, K, 8).astype(np.float32),
        "dimension": dim,
        "amodal_offset": rs.randn(B, K, 2).astype(np.float32),
        "velocity": rs.randn(B, K, 3).astype(np.float32),
        "nuscenes_att": rs.randn(B, K, 8).astype(np.float32),
    }
    calib = np.tile(
        np.array([[1266.4, 0, 816.3, 0], [0, 1266.4, 491.5, 0],
                  [0, 0, 1, 0]], np.float32), (B, 1, 1))

    blob = {f"in_{k}": v for k, v in inputs.items()}
    blob["center"], blob["scale"] = center, np.float32(scale)
    blob["out_hw"] = np.array([oh, ow], np.int64)
    blob["calib"] = calib

    variants = [
        ("full", dict(inputs), False),
        # no amodal_offset: centers fall back to the bbox mean
        ("noamodal", {k: v for k, v in inputs.items()
                      if k != "amodal_offset"}, False),
        ("gt", dict(inputs), True),
    ]
    for tag, inp, is_gt in variants:
        y = {k: t(v.copy()) for k, v in inp.items()}
        out = postProcess(y, center.copy(), scale, oh, ow, t(calib.copy()),
                          isGt=is_gt)
        for k, v in out.items():
            blob[f"{tag}_{k}"] = v.numpy()
    np.savez(os.path.join(out_dir, "postprocess.npz"), **blob)
    print(f"wrote postprocess.npz ({len(blob)} arrays)")


def _ref_nuscenes_instance(config):
    """A reference nuScenes dataset instance WITHOUT __init__ (no data on
    disk): class-level tables (att ranges, class ids) come from the class,
    config/sizeThresh are injected — exactly the state addInstance and
    processPointCloud read."""
    from dataset.datasets.nuscenes import nuScenes

    ds = nuScenes.__new__(nuScenes)
    ds.config = config
    ds.split = "val"
    ds.sizeThresh = [
        [0, 0.0018, 0.0085][l]
        for l in range(len(config.MODEL.PYRAMID_OUT_SIZE))
    ]
    return ds


def gen_radar(torch, out_dir):
    """Radar-rasterize goldens by EXECUTING the reference
    ``processPointCloud`` (generic_dataset.py:738-828) through the real
    nuScenes subclass draw methods (nuscenes.py:221-294): point transform +
    in-image filtering, then each PC_ROI_METHOD — pillars (3D pillar
    projection via getPcPillarsSize), heatmap (depth-scaled gaussian-radius
    boxes), points (single-pixel scatter) — plus a one-hot pillars case."""
    from config import config

    rs = np.random.RandomState(47)
    oh, ow = 24, 40
    ih, iw = 96, 160
    config.defrost()
    config.DEBUG = 0
    config.MODEL.OUTPUT_SIZE = (oh, ow)
    config.MODEL.INPUT_SIZE = (ih, iw)
    config.MODEL.PYRAMID_OUT_SIZE = [(oh, ow)]
    config.DATASET.PILLAR_DIMS = (1.5, 0.2, 0.2)
    config.DATASET.MAX_PC_DIST = 60.0

    # camera-frame 3D radar points; pc_2d from projecting through the calib
    n = 40
    calib = np.array([[400.0, 0, 800.0, 0], [0, 400.0, 450.0, 0],
                      [0, 0, 1, 0]], np.float32)
    z = rs.uniform(2.0, 58.0, n)
    x3 = rs.uniform(-1.8, 1.8, n) * z / 2
    y3 = rs.uniform(0.2, 1.8, n)
    pc_3d = np.zeros((18, n), np.float32)
    pc_3d[0], pc_3d[1], pc_3d[2] = x3, y3, z
    pc_3d[8], pc_3d[9] = rs.randn(n), rs.randn(n)  # vx, vz (comp. velocities)
    px = calib[0, 0] * x3 / z + calib[0, 2]
    py = calib[1, 1] * y3 / z + calib[1, 2]
    pc_2d = np.stack([px, py, z]).astype(np.float32)

    from utils.image import getAffineTransform

    center = np.array([800.0, 450.0], np.float32)
    scale = 1600.0
    trans_in = getAffineTransform(center, scale, 0, [iw, ih]).astype(
        np.float32)
    trans_out = getAffineTransform(center, scale, 0, [ow, oh]).astype(
        np.float32)
    img = np.zeros((900, 1600, 3), np.uint8)
    img_info = {"calib": calib.tolist()}

    blob = {"pc_2d": pc_2d, "pc_3d": pc_3d, "calib": calib,
            "trans_in": trans_in, "trans_out": trans_out,
            "meta": np.array([oh, ow, 60.0], np.float64)}
    for method, onehot, maxdist in [("pillars", False, 60.0),
                                    ("heatmap", False, 60.0),
                                    ("points", False, 60.0),
                                    ("pillars", True, 10.0)]:
        config.DATASET.PC_ROI_METHOD = method
        config.DATASET.ONE_HOT_PC = onehot
        config.DATASET.MAX_PC_DIST = maxdist
        ds = _ref_nuscenes_instance(config)
        # loadRadarPointCloud filters to <= MAX_PC_DIST before rasterizing
        # (nuscenes.py:160-165); replicate that upstream filter here
        keep = pc_3d[2] <= maxdist
        pts, p3d, depth_map = ds.processPointCloud(
            pc_2d[:, keep].copy(), pc_3d[:, keep].copy(), img, trans_in,
            trans_out, img_info)
        tag = f"{method}{'_onehot' if onehot else ''}"
        blob[f"{tag}_points"] = pts
        blob[f"{tag}_pc3d"] = p3d
        blob[f"{tag}_depthmap"] = depth_map
        blob[f"{tag}_maxdist"] = np.float64(maxdist)
    np.savez(os.path.join(out_dir, "radar_raster.npz"), **blob)
    print(f"wrote radar_raster.npz ({len(blob)} arrays)")


def gen_targets(torch, out_dir):
    """Target-builder goldens by EXECUTING the reference ``initReturn`` +
    ``transformBbox`` + ``addInstance`` (generic_dataset.py:441-708) on
    crafted annotations: layer assignment by bbox area, circular vs
    elliptical (out-of-view amodal) heatmap splats, truncation, 8-bin
    rotation at the bin boundaries, attribute/velocity masks and sentinels,
    NORM_2D, depth scale-factor, 3D GT corners, and the train-time
    GT-frustum pc_hm painting."""
    from config import config

    heads = {"heatmap": 10, "reg": 2, "widthHeight": 2, "depth": 1,
             "rotation": 8, "dimension": 3, "amodal_offset": 2,
             "nuscenes_att": 8, "velocity": 3, "depth2": 1, "rotation2": 8}
    oh, ow = 24, 40
    calib = np.array([[400.0, 0, 800.0, 0], [0, 400.0, 450.0, 0],
                      [0, 0, 1, 0]], np.float32)
    from utils.image import getAffineTransform

    center = np.array([800.0, 450.0], np.float32)
    scale = 1600.0
    rs = np.random.RandomState(53)

    def make_anns():
        pi = np.pi
        anns = [
            # ordinary interior object, all fields
            dict(bbox=[700, 380, 180, 140], truncated=0,
                 amodal_center=[790, 450], attributes=6,
                 velocity_cam=[3.0, 0.1, -1.5, 0.0], alpha=0.4,
                 depth=22.0, dimension=[1.6, 1.9, 4.2],
                 location=[2.0, 1.0, 22.0], yaw=0.5),
            # amodal center far outside -> clipped -> elliptical splat
            dict(bbox=[1450, 400, 300, 200], truncated=1,
                 amodal_center=[1750, 500], attributes=3,
                 velocity_cam=[0.5, 0.0, 0.2, 0.0], alpha=-2.0,
                 depth=15.0, dimension=[1.7, 0.6, 0.8],
                 location=[8.0, 1.2, 15.0], yaw=-1.8),
            # sentinel velocity (skipped), attribute 0 (skipped)
            dict(bbox=[100, 500, 90, 70], truncated=0,
                 amodal_center=[150, 530], attributes=0,
                 velocity_cam=[-10000.0, -10000.0, -10000.0, 0.0],
                 alpha=pi / 6.0, depth=40.0, dimension=[1.5, 1.8, 4.0],
                 location=[-12.0, 1.5, 40.0], yaw=2.9),
            # alpha in the overlap region (both bins active)
            dict(bbox=[400, 420, 260, 200], truncated=0,
                 amodal_center=[520, 510], attributes=7,
                 velocity_cam=[0.0, 0.0, 0.0, 0.0], alpha=0.0,
                 depth=9.0, dimension=[1.4, 1.7, 3.8],
                 location=[-4.0, 1.1, 9.0], yaw=-0.2),
            # tiny far box (layer-0 in the 2-layer config), alpha near -pi
            dict(bbox=[820, 440, 22, 18], truncated=0,
                 amodal_center=[831, 449], attributes=1,
                 velocity_cam=[1.0, 0.0, 1.0, 0.0], alpha=-3.0,
                 depth=55.0, dimension=[1.0, 0.4, 1.9],
                 location=[1.5, 0.9, 55.0], yaw=1.0),
            # no amodal_center key -> 2d heatCenter path
            dict(bbox=[1000, 300, 140, 260], truncated=0, attributes=4,
                 velocity_cam=[0.2, 0.0, -0.2, 0.0], alpha=2.8,
                 depth=18.0, dimension=[1.8, 0.7, 0.9],
                 location=[5.0, 1.3, 18.0], yaw=0.9),
            # degenerate box after transform (zero width) -> skipped
            dict(bbox=[-50, 200, 1, 300], truncated=0,
                 amodal_center=[-40, 350], attributes=2,
                 velocity_cam=[0.0, 0.0, 0.0, 0.0], alpha=1.0,
                 depth=30.0, dimension=[1.2, 0.5, 1.8],
                 location=[-20.0, 1.0, 30.0], yaw=0.1),
            # huge near box (upper layer in the 2-layer config)
            dict(bbox=[200, 100, 1100, 750], truncated=0,
                 amodal_center=[750, 480], attributes=8,
                 velocity_cam=[-2.0, 0.0, 4.0, 0.0], alpha=-pi / 2,
                 depth=4.0, dimension=[3.2, 2.5, 10.0],
                 location=[0.0, 1.8, 4.0], yaw=-1.6),
        ]
        return anns

    blob = {"calib": calib, "out_hw": np.array([oh, ow], np.int64)}
    configs = [
        ("single", [(oh, ow)], False, "3d", True, 1.0),
        ("pyramid", [(oh, ow), (oh * 2, ow * 2)], True, "2d", False, 1.2),
    ]
    for tag, pyramid, norm2d, hm_rep, frustum, scale_factor in configs:
        config.defrost()
        config.DEBUG = 0
        config.heads = dict(heads)
        config.MODEL.OUTPUT_SIZE = (oh, ow)
        config.MODEL.PYRAMID_OUT_SIZE = [list(p) for p in pyramid]
        config.MODEL.NORM_2D = norm2d
        config.MODEL.FRUSTUM = frustum
        config.DATASET.HEATMAP_REP = hm_rep
        config.DATASET.RADAR_PC = frustum
        config.DATASET.MAX_PC_DIST = 60.0
        ds = _ref_nuscenes_instance(config)
        ds.max_objs = 16
        ds.num_categories = 10

        trans_out = getAffineTransform(center, scale, 0, [ow, oh]).astype(
            np.float32)
        item, target = {"calib": calib.copy()}, {}
        if frustum:
            pc_dep = np.zeros((3, oh, ow), np.float32)
            nz = 60
            ys_, xs_ = rs.randint(0, oh, nz), rs.randint(0, ow, nz)
            pc_dep[0, ys_, xs_] = rs.uniform(1.0, 60.0, nz)
            pc_dep[1, ys_, xs_] = rs.randn(nz)
            pc_dep[2, ys_, xs_] = rs.randn(nz)
            item["pc_dep"] = pc_dep
            item["pc_hm"] = np.zeros((3, oh, ow), np.float32)
            blob[f"{tag}_pc_dep"] = pc_dep.copy()
        ds.initReturn(item, target)
        anns = make_anns()
        for i, ann in enumerate(anns):
            class_id = (i % 10)
            bbox = ds.transformBbox(ann["bbox"], trans_out)
            blob[f"{tag}_bbox{i}"] = bbox
            ds.addInstance(item, target, i, class_id, bbox, ann, trans_out,
                           scale_factor)
        blob[f"{tag}_trans_out"] = trans_out
        blob[f"{tag}_scale_factor"] = np.float64(scale_factor)
        blob[f"{tag}_class_ids"] = np.array(
            [i % 10 for i in range(len(anns))], np.int64)
        for k, v in item.items():
            if isinstance(v, np.ndarray):
                blob[f"{tag}_item_{k}"] = v
        for k, v in target.items():
            blob[f"{tag}_target_{k}"] = v
    # annotations as json for the test side
    import json as _json

    blob["anns_json"] = np.frombuffer(
        _json.dumps(make_anns()).encode(), dtype=np.uint8)
    blob["aug_center"], blob["aug_scale"] = center, np.float32(scale)
    np.savez(os.path.join(out_dir, "targets.npz"), **blob)
    print(f"wrote targets.npz ({len(blob)} arrays)")


def _install_eval_stubs():
    """Faithful minimal devkit primitives so the reference's MODIFIED
    ``nuScenes_lib/algo.py:accumulate`` executes for real. These transcribe
    the public nuscenes-devkit definitions (eval/common/utils.py,
    eval/detection/data_classes.py) — the code under test is the reference's
    matching/interp/mAR logic, which imports but does not redefine them."""

    def center_distance(gt_box, pred_box):
        return np.linalg.norm(
            np.array(pred_box.translation[:2]) - np.array(gt_box.translation[:2])
        )

    def velocity_l2(gt_box, pred_box):
        return np.linalg.norm(
            np.array(pred_box.velocity) - np.array(gt_box.velocity)
        )

    def scale_iou(sa, sr):
        sa_size, sr_size = np.array(sa.size), np.array(sr.size)
        assert all(sa_size > 0) and all(sr_size > 0)
        inter = np.prod(np.minimum(sa_size, sr_size))
        union = np.prod(sa_size) + np.prod(sr_size) - inter
        return inter / union

    def _quat_yaw(q):
        w, x, y, z = q
        return np.arctan2(2 * (x * y + w * z), 1 - 2 * (y * y + z * z))

    def yaw_diff(gt_box, eval_box, period=2 * np.pi):
        yaw_gt = _quat_yaw(gt_box.rotation)
        yaw_est = _quat_yaw(eval_box.rotation)
        diff = (yaw_gt - yaw_est + period / 2) % period - period / 2
        return abs(diff)

    def attr_acc(gt_box, pred_box):
        if gt_box.attribute_name == "":
            return np.nan
        return float(gt_box.attribute_name == pred_box.attribute_name)

    def cummean(x):
        if sum(np.isnan(x)) == len(x):
            return np.ones(len(x))
        sum_vals = np.nancumsum(x.astype(float))
        count_vals = np.cumsum(~np.isnan(x))
        return np.divide(sum_vals, count_vals, out=np.zeros_like(sum_vals),
                         where=count_vals > 0)

    _stub(
        "nuscenes.eval.common.utils",
        center_distance=center_distance, scale_iou=scale_iou,
        yaw_diff=yaw_diff, velocity_l2=velocity_l2, attr_acc=attr_acc,
        cummean=cummean,
    )

    class DetectionMetricData:
        nelem = 101

        def __init__(self, recall, precision, confidence, trans_err, vel_err,
                     scale_err, orient_err, attr_err):
            self.recall, self.precision = recall, precision
            self.confidence = confidence
            self.trans_err, self.vel_err = trans_err, vel_err
            self.scale_err, self.orient_err = scale_err, orient_err
            self.attr_err = attr_err

        @classmethod
        def no_predictions(cls):
            n = cls.nelem
            return cls(recall=np.linspace(0, 1, n), precision=np.zeros(n),
                       confidence=np.zeros(n), trans_err=np.ones(n),
                       vel_err=np.ones(n), scale_err=np.ones(n),
                       orient_err=np.ones(n), attr_err=np.ones(n))

    sys.modules["nuscenes.eval.detection.data_classes"].DetectionMetricData = (
        DetectionMetricData
    )


def gen_eval_accumulate(torch, out_dir):
    """Detection-metric goldens by EXECUTING the reference's modified
    ``accumulate`` (/root/reference/src/lib/nuScenes_lib/algo.py:21-207):
    greedy confidence-sorted center-distance matching (incl. its score-TIE
    ordering), 101-point precision/confidence interpolation, NaN-aware
    TP-error resampling, the npos==0 / no-match early returns, and the exact
    achieved-recall record used for mAR.csv."""
    _install_eval_stubs()
    sys.path.insert(0, "/root/reference/src/lib/nuScenes_lib")
    import algo as ref_algo

    class _Box:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class _Boxes:
        def __init__(self):
            self.boxes = {}

        def add(self, token, box):
            self.boxes.setdefault(token, []).append(box)

        def __getitem__(self, token):
            return self.boxes.get(token, [])

        @property
        def all(self):
            return [b for bs in self.boxes.values() for b in bs]

        @property
        def sample_tokens(self):
            return list(self.boxes.keys())

    rs = np.random.RandomState(61)
    tokens = [f"s{i}" for i in range(6)]

    def yaw_quat(yaw):
        return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)],
                        np.float64)

    def rand_box(token, name, score=None, attr="", nan_vel=False):
        vel = (np.full(2, np.nan) if nan_vel
               else rs.randn(2).astype(np.float64))
        return dict(
            sample_token=token, detection_name=name,
            translation=rs.randn(3).astype(np.float64) * np.array([20, 20, 1]),
            size=(np.abs(rs.randn(3)) + 0.4).astype(np.float64),
            rotation=yaw_quat(rs.uniform(-np.pi, np.pi)),
            velocity=vel, attribute_name=attr,
            detection_score=(float(rs.rand()) if score is None
                             else float(score)),
        )

    gt_rows, pred_rows = [], []
    attrs = ["vehicle.moving", "vehicle.parked", "vehicle.stopped"]
    # cars: dense GT + preds, deliberate score ties (same score across AND
    # within samples — pins the reference's (conf, index) tie ordering)
    for ti, tok in enumerate(tokens):
        for j in range(3):
            gt_rows.append(rand_box(tok, "car", attr=attrs[j % 3]))
    for ti, tok in enumerate(tokens):
        for j in range(4):
            score = 0.7 if (j < 2 and ti < 4) else None  # many exact ties
            # half the preds carry the attr of the GT they sit near -> a
            # mixed attr_err curve instead of a constant
            attr = attrs[j % 3] if j % 2 == 0 else attrs[(j + 1) % 3]
            base = rand_box(tok, "car", score=score, attr=attr)
            # place most preds NEAR some GT so matches happen: copy a GT
            # translation + noise
            src = gt_rows[ti * 3 + (j % 3)]
            base["translation"] = (np.array(src["translation"])
                                   + rs.randn(3) * [0.8, 0.8, 0.1])
            pred_rows.append(base)
    # barriers: '' GT attributes (NaN attr_err), pi-period yaw
    for tok in tokens[:3]:
        g = rand_box(tok, "barrier", attr="", nan_vel=True)
        gt_rows.append(g)
        p = rand_box(tok, "barrier", attr="")
        p["translation"] = np.array(g["translation"]) + rs.randn(3) * 0.5
        pred_rows.append(p)
    # traffic cones: a couple of GT, preds far away at one threshold
    for tok in tokens[3:]:
        g = rand_box(tok, "traffic_cone", attr="", nan_vel=True)
        gt_rows.append(g)
        p = rand_box(tok, "traffic_cone", attr="")
        p["translation"] = np.array(g["translation"]) + rs.randn(3) * 2.5
        pred_rows.append(p)
    # bus: predictions but ZERO GT (npos==0 early return)
    pred_rows.append(rand_box(tokens[0], "bus", attr="vehicle.moving"))
    # truck: GT but hopeless predictions (no-match early return)
    g = rand_box(tokens[1], "truck", attr="vehicle.parked")
    gt_rows.append(g)
    p = rand_box(tokens[1], "truck", attr="vehicle.parked")
    p["translation"] = np.array(g["translation"]) + 500.0
    pred_rows.append(p)

    gt, pred = _Boxes(), _Boxes()
    for r in gt_rows:
        gt.add(r["sample_token"], _Box(**r))
    for r in pred_rows:
        pred.add(r["sample_token"], _Box(**r))

    from nuscenes.eval.common.utils import center_distance

    blob = {}

    def pack(rows, prefix):
        blob[f"{prefix}_token"] = np.array(
            [r["sample_token"] for r in rows])
        blob[f"{prefix}_name"] = np.array(
            [r["detection_name"] for r in rows])
        blob[f"{prefix}_attr"] = np.array(
            [r["attribute_name"] for r in rows])
        blob[f"{prefix}_translation"] = np.stack(
            [r["translation"] for r in rows])
        blob[f"{prefix}_size"] = np.stack([r["size"] for r in rows])
        blob[f"{prefix}_rotation"] = np.stack([r["rotation"] for r in rows])
        blob[f"{prefix}_velocity"] = np.stack([r["velocity"] for r in rows])
        blob[f"{prefix}_score"] = np.array(
            [r["detection_score"] for r in rows])

    pack(gt_rows, "gt")
    pack(pred_rows, "pred")

    cases = [("car", 0.5), ("car", 1.0), ("car", 2.0), ("car", 4.0),
             ("barrier", 2.0), ("traffic_cone", 1.0), ("bus", 2.0),
             ("truck", 2.0)]
    for cls, dist_th in cases:
        md, add = ref_algo.accumulate(gt, pred, cls, center_distance,
                                      dist_th)
        tag = f"{cls}_{dist_th}"
        for field in ("recall", "precision", "confidence", "trans_err",
                      "vel_err", "scale_err", "orient_err", "attr_err"):
            blob[f"{tag}_{field}"] = np.asarray(getattr(md, field))
        blob[f"{tag}_maxrecall"] = np.float64(add["Recall"])
    blob["cases"] = np.array([f"{c}_{d}" for c, d in cases])
    np.savez(os.path.join(out_dir, "eval_accumulate.npz"), **blob)
    print(f"wrote eval_accumulate.npz ({len(blob)} arrays)")


def gen_legacy_names(torch, out_dir):
    """Checkpoint name-modernization goldens by EXECUTING the reference
    ``toggleWeightName(name, to="new")`` (model/model.py:165-250) over a
    corpus covering every branch: upstream-v1 head prefixes (dep_sec./hm./
    wh./...), bare oldv2 head names, the DCN up-node ``conv.weight`` regex
    rename, actf->activation, conv.conv_offset_mask, and already-modern
    names that must pass through unchanged."""
    from model.model import toggleWeightName

    corpus = [
        # v1 upstream head names
        "dep_sec.0.weight", "rot_sec.2.bias", "hm.0.weight", "wh.1.bias",
        "dep.0.weight", "dim.0.weight", "rot.0.bias",
        "amodel_offset.0.weight",
        # oldv2 bare heads
        "heatmap.0.weight", "reg.1.bias", "widthHeight.0.weight",
        "depth.0.weight", "depth2.0.weight", "rotation.0.weight",
        "rotation2.2.bias", "dimension.0.weight", "amodal_offset.0.weight",
        "nuscenes_att.0.weight", "velocity.1.bias",
        # DCN up-node legacy conv.{weight,bias}
        "dla_up.ida_0.proj_1.conv.weight", "dla_up.ida_1.node_2.conv.bias",
        "ida_up.proj_1.conv.weight", "ida_up.node_2.conv.bias",
        # already-new up-node params (must NOT be rewritten)
        "dla_up.ida_0.proj_1.weight", "ida_up.node_2.bias",
        # offset conv + activation renames
        "dla_up.ida_0.proj_1.conv.conv_offset_mask.weight",
        "ida_up.node_1.actf.0.weight",
        # modern names pass through
        "detectHead_0.heatmap.0.weight", "base.base_layer.0.weight",
        "detectHead_0.depth2.0.bias",
        "base.level5.tree1.conv1.weight",
    ]
    mapping = {k: toggleWeightName(k, to="new") for k in corpus}
    import json as _json

    np.savez(os.path.join(out_dir, "legacy_names.npz"),
             mapping_json=np.frombuffer(_json.dumps(mapping).encode(),
                                        np.uint8))
    print(f"wrote legacy_names.npz ({len(mapping)} names)")


def gen_detector_preprocess(torch, out_dir):
    """Serving pre-process goldens by EXECUTING the reference
    ``Detector.pre_process`` (detector.py:189-322): multi-camera concat
    affine warp + normalization, per-camera calib assembly, and the serving
    radar block (distance filter, PC_Z_OFFSET, border-margin projection,
    depth sort, pillar rasterize) — the whole host side of one inference."""
    from detector import Detector
    from config import config

    torch.cuda.synchronize = lambda *a, **k: None  # return_time on CPU

    rs = np.random.RandomState(113)
    oh, ow = 24, 40
    ih, iw = 96, 160
    H, W = 90, 160  # "original" camera resolution

    blob = {}
    for tag, z_offset in [("plain", 0.0), ("zoff", 0.5)]:
        config.defrost()
        config.DEBUG = 0
        config.GPUS = [-1]
        config.DATASET.RADAR_PC = True
        config.DATASET.MAX_PC_DIST = 60.0
        config.DATASET.PC_Z_OFFSET = z_offset
        config.DATASET.PC_ROI_METHOD = "pillars"
        config.DATASET.ONE_HOT_PC = False
        config.DATASET.PC_REVERSE = True  # pillars (config/utils.py:31-33)
        config.DATASET.PILLAR_DIMS = (1.5, 0.2, 0.2)
        config.MODEL.INPUT_SIZE = (ih, iw)
        config.MODEL.OUTPUT_SIZE = (oh, ow)
        config.MODEL.PYRAMID_OUT_SIZE = [(oh, ow)]
        ds = _ref_nuscenes_instance(config)

        det = Detector.__new__(Detector)
        det.config = config
        det.dataset = ds
        det.mean = np.array(ds.mean, np.float32).reshape(1, 1, 3)
        det.std = np.array(ds.std, np.float32).reshape(1, 1, 3)
        det.device = torch.device("cpu")

        imgs = [
            (rs.rand(H, W, 3) * 255).astype(np.uint8) for _ in range(2)
        ]
        calib = np.array([[120.0, 0, W / 2, 0], [0, 120.0, H / 2, 0],
                          [0, 0, 1, 0]], np.float32)
        infos = [{"calib": calib.tolist(),
                  "camera_intrinsic": calib[:3, :3].tolist(),
                  "width": W, "height": H} for _ in range(2)]
        n = 35
        z = rs.uniform(2.0, 70.0, n)  # some beyond MAX_PC_DIST
        pc = np.zeros((18, n), np.float32)
        pc[0] = rs.uniform(-0.6, 0.6, n) * z
        pc[1] = rs.uniform(0.1, 1.2, n)
        pc[2] = z
        pc[8], pc[9] = rs.randn(n), rs.randn(n)
        radars = [pc.copy(), pc[:, ::2].copy()]

        (images, pc_deps, metas, calibs), _t = det.pre_process(
            [im.copy() for im in imgs], infos, [r.copy() for r in radars])

        blob[f"{tag}_img0"], blob[f"{tag}_img1"] = imgs
        blob[f"{tag}_radar0"], blob[f"{tag}_radar1"] = radars
        blob[f"{tag}_calib"] = calib
        blob[f"{tag}_out_images"] = images.numpy()
        blob[f"{tag}_out_pc_deps"] = pc_deps.numpy()
        blob[f"{tag}_out_calibs"] = calibs.numpy()
        blob[f"{tag}_mean"] = det.mean
        blob[f"{tag}_std"] = det.std
    blob["meta"] = np.array([H, W, ih, iw, oh, ow], np.int64)
    np.savez(os.path.join(out_dir, "detector_preprocess.npz"), **blob)
    print("wrote detector_preprocess.npz")


def gen_eval_filter(torch, out_dir):
    """Eval box-filtering goldens by EXECUTING the reference's modified
    ``filter_eval_boxes`` (nuScenes_lib/loaders.py:248-341): the strict
    min/max ego-distance band (multi-range eval), the zero-point filter,
    bike-rack suppression of bicycles/motorcycles via devkit
    ``points_in_box`` geometry, and the night/rain scene-keyword filter."""

    class _DetectionBox:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        @property
        def ego_dist(self):
            return float(np.hypot(self.ego_translation[0],
                                  self.ego_translation[1]))

    class _BoxWithCorners(_FaithfulBox):
        def corners(self, wlh_factor=1.0):
            w, l, h = self.wlh * wlh_factor
            x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
            y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
            z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
            pts = np.vstack((x, y, z))
            pts = self.orientation.rotation_matrix @ pts
            return pts + self.center.reshape(3, 1)

    def _points_in_box(box, points, wlh_factor=1.0):
        corners = box.corners(wlh_factor=wlh_factor)
        p1, p_x, p_y, p_z = (corners[:, 0], corners[:, 4], corners[:, 1],
                             corners[:, 3])
        i, j, k = p_x - p1, p_y - p1, p_z - p1
        v = points - p1.reshape((-1, 1))
        iv, jv, kv = i @ v, j @ v, k @ v
        return (np.logical_and(0 <= iv, iv <= i @ i)
                & np.logical_and(0 <= jv, jv <= j @ j)
                & np.logical_and(0 <= kv, kv <= k @ k))

    sys.modules["nuscenes.eval.detection.data_classes"].DetectionBox = (
        _DetectionBox
    )
    _stub("nuscenes.eval.tracking.data_classes", TrackingBox=type(
        "TrackingBox", (), {}))
    _stub("nuscenes.utils.splits", create_splits_scenes=lambda *a, **k: {})
    sys.modules["nuscenes"].NuScenes = object
    sys.modules["pyquaternion"].Quaternion = _FaithfulQuaternion
    sys.modules["nuscenes.utils.data_classes"].Box = _BoxWithCorners
    sys.modules["nuscenes.utils.geometry_utils"].points_in_box = (
        _points_in_box
    )
    sys.path.insert(0, "/root/reference/src/lib/nuScenes_lib")
    import loaders as ref_loaders

    import importlib

    importlib.reload(ref_loaders)  # pick up the faithful stubs

    class _Boxes:
        def __init__(self):
            self.boxes = {}

        def add(self, token, box):
            self.boxes.setdefault(token, []).append(box)

        def __getitem__(self, token):
            return self.boxes.get(token, [])

        @property
        def sample_tokens(self):
            return list(self.boxes.keys())

    def yaw_quat(yaw):
        return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]

    tokens = ["sA", "sB", "sC"]
    scenes = {"sA": "Rain, city traffic", "sB": "sunny, boring",
              "sC": "very dark, parked cars"}
    # one bike rack annotation in sA (10 x 4 x 2 m at the origin, yawed)
    rack = {"translation": [5.0, 5.0, 1.0], "size": [4.0, 10.0, 2.0],
            "rotation": yaw_quat(0.4),
            "category_name": "static_object.bicycle_rack"}
    samples = {t: {"scene_token": f"sc_{t}",
                   "anns": (["rack0"] if t == "sA" else [])}
               for t in tokens}
    nusc_tables = {
        "sample": samples,
        "scene": {f"sc_{t}": {"description": scenes[t]} for t in tokens},
        "sample_annotation": {"rack0": rack},
    }

    class _FakeNusc:
        def get(self, table, token):
            return nusc_tables[table][token]

    max_dist = {"car": 50.0, "bicycle": 40.0, "motorcycle": 40.0,
                "pedestrian": 40.0}
    min_dist = {k: 30.0 for k in max_dist}

    rows = [
        # (uid, token, name, ego_xy, num_pts, translation)
        (0, "sA", "car", (40.0, 0.0), 5, [40.0, 0.0, 0.5]),      # in band
        (1, "sA", "car", (50.0, 0.0), 5, [50.0, 0.0, 0.5]),      # == max
        (2, "sA", "car", (30.0, 0.0), 5, [30.0, 0.0, 0.5]),      # == min
        (3, "sA", "car", (29.9, 0.0), 5, [29.9, 0.0, 0.5]),      # below band
        (4, "sA", "pedestrian", (35.0, 0.0), 0, [35.0, 0.0, 0.5]),  # 0 pts
        (5, "sA", "pedestrian", (35.0, 0.0), -1, [35.0, 0.0, 0.5]),  # pred
        (6, "sA", "bicycle", (32.0, 10.0), 3, [5.5, 5.5, 1.0]),  # IN rack
        (7, "sA", "bicycle", (32.0, 10.0), 3, [25.0, 25.0, 1.0]),  # out
        (8, "sA", "motorcycle", (33.0, 5.0), 2, [5.0, 6.0, 1.2]),  # IN rack
        (9, "sA", "car", (31.0, 2.0), 9, [5.0, 5.0, 1.0]),  # car in rack ok
        (10, "sB", "car", (45.0, 0.0), 4, [45.0, 0.0, 0.5]),   # keyword-cut
        (11, "sC", "car", (45.0, 0.0), 4, [45.0, 0.0, 0.5]),   # 'very dark'
    ]
    boxes = _Boxes()
    DetectionBox = _DetectionBox
    for uid, tok, name, exy, npts, tr in rows:
        boxes.add(tok, DetectionBox(
            sample_token=tok, detection_name=name,
            ego_translation=[exy[0], exy[1], 0.0], num_pts=npts,
            translation=tr, size=[0.6, 1.8, 1.2],
            rotation=yaw_quat(0.1), uid=uid))

    import json as _json

    blob = {
        "rows_json": np.frombuffer(_json.dumps(rows).encode(), np.uint8),
        "scenes_json": np.frombuffer(_json.dumps(scenes).encode(), np.uint8),
        "rack_json": np.frombuffer(_json.dumps(rack).encode(), np.uint8),
        "max_dist_json": np.frombuffer(
            _json.dumps(max_dist).encode(), np.uint8),
    }
    # night+rain keywords as DetectionEval derives them (evaluate.py:104-112)
    for tag, keywords in [("plain", None),
                          ("extreme", ["dark", "very dark", "Night", "Rain",
                                       "heavy rain"])]:
        import copy

        eb = _Boxes()
        eb.boxes = {t: list(boxes.boxes[t]) for t in boxes.boxes}
        out = ref_loaders.filter_eval_boxes(
            _FakeNusc(), eb, max_dist, min_dist, keywords=keywords)
        blob[f"{tag}_kept_json"] = np.frombuffer(_json.dumps(
            {t: [b.uid for b in out.boxes[t]] for t in out.boxes}
        ).encode(), np.uint8)
    np.savez(os.path.join(out_dir, "eval_filter.npz"), **blob)
    print("wrote eval_filter.npz")


def gen_multisweep(torch, out_dir):
    """Multisweep radar-aggregation goldens by EXECUTING the reference
    ``RadarPointCloudWithVelocity.from_file_multisweep``
    (utils/pointcloud.py:54-192) with faithful devkit replacements
    (RadarPointCloud base incl. its per-axis ``remove_close`` box filter,
    ``transform_matrix``, pyquaternion): the 4-matrix coordinate chain, the
    separate rotation-only chain for compensated velocities, per-sweep
    prev-token walking, and the sweep time lags."""
    import importlib

    FILES = {}

    class _RadarPointCloud:
        """Faithful minimal devkit PointCloud base (data_classes.py)."""

        def __init__(self, points):
            self.points = points

        @staticmethod
        def nbr_dims():
            return 18

        @classmethod
        def from_file(cls, file_name):
            return cls(FILES[os.path.basename(file_name)].copy())

        def nbr_points(self):
            return self.points.shape[1]

        def remove_close(self, radius):
            # devkit semantics: an axis-aligned BOX, not a radial disk
            x_filt = np.abs(self.points[0, :]) < radius
            y_filt = np.abs(self.points[1, :]) < radius
            not_close = np.logical_not(np.logical_and(x_filt, y_filt))
            self.points = self.points[:, not_close]

        def transform(self, transf_matrix):
            self.points[:3, :] = transf_matrix.dot(
                np.vstack((self.points[:3, :], np.ones(self.nbr_points())))
            )[:3, :]

    def _transform_matrix(translation, rotation, inverse=False):
        tm = np.eye(4)
        if inverse:
            rot_inv = rotation.rotation_matrix.T
            trans = np.transpose(-np.array(translation))
            tm[:3, :3] = rot_inv
            tm[:3, 3] = rot_inv.dot(trans)
        else:
            tm[:3, :3] = rotation.rotation_matrix
            tm[:3, 3] = np.transpose(np.array(translation))
        return tm

    sys.modules["nuscenes.utils.data_classes"].RadarPointCloud = (
        _RadarPointCloud
    )
    sys.modules["nuscenes.utils.geometry_utils"].transform_matrix = (
        _transform_matrix
    )
    sys.modules["pyquaternion"].Quaternion = _FaithfulQuaternion
    import utils.pointcloud as refpc

    importlib.reload(refpc)  # rebuild the class on the faithful base

    rs = np.random.RandomState(97)

    def q(yaw, pitch=0.0):
        a = _FaithfulQuaternion(axis=[0, 0, 1], angle=yaw)
        b = _FaithfulQuaternion(axis=[0, 1, 0], angle=pitch)
        return (a * b).q.tolist()

    # records: a CAM_FRONT reference + a 3-sweep radar chain, each frame
    # with its own pose/sensor extrinsics
    sample_data, ego_pose, calibrated_sensor = {}, {}, {}
    ego_pose["ep_ref"] = {"translation": [100.0, 50.0, 0.0],
                          "rotation": q(0.3, 0.01)}
    calibrated_sensor["cs_ref"] = {"translation": [1.5, 0.2, 1.6],
                                   "rotation": q(-0.2, 0.02)}
    sample_data["sd_cam"] = {"ego_pose_token": "ep_ref",
                             "calibrated_sensor_token": "cs_ref",
                             "timestamp": 1_000_000, "prev": "",
                             "filename": "cam.jpg"}
    prev = ""
    for i in reversed(range(3)):
        ego_pose[f"ep_r{i}"] = {
            "translation": [100.0 - 2.5 * i, 50.0 - 0.8 * i, 0.0],
            "rotation": q(0.3 - 0.05 * i)}
        calibrated_sensor[f"cs_r{i}"] = {
            "translation": [2.4, 0.0, 0.5], "rotation": q(0.05 * i, 0.0)}
        sample_data[f"sd_r{i}"] = {
            "ego_pose_token": f"ep_r{i}",
            "calibrated_sensor_token": f"cs_r{i}",
            "timestamp": 1_000_000 - 60_000 * i, "prev": prev,
            "filename": f"sweeps/RADAR_FRONT/s{i}.pcd"}
        prev = f"sd_r{i}"

    sweeps = {}
    for i in range(3):
        n = 12
        pts = np.zeros((18, n), np.float32)
        pts[0] = np.round(rs.uniform(-30, 30, n), 3)
        pts[1] = np.round(rs.uniform(-20, 20, n), 3)
        pts[2] = np.round(rs.uniform(-0.5, 0.5, n), 3)
        pts[3:8] = np.round(rs.randn(5, n), 3)
        pts[8] = np.round(rs.randn(n) * 3, 3)   # vx_comp
        pts[9] = np.round(rs.randn(n) * 3, 3)   # vy_comp
        pts[10:] = np.round(rs.randn(8, n), 3)
        # pin remove_close: unit-box corner (radially > 1 but inside the
        # box) must be REMOVED; axis-near points with one large axis kept
        pts[0, 0], pts[1, 0] = 0.9, 0.9
        pts[0, 1], pts[1, 1] = 0.5, 5.0
        pts[0, 2], pts[1, 2] = 0.2, 0.3
        sweeps[f"s{i}.pcd"] = pts
        FILES[f"s{i}.pcd"] = pts.astype(np.float64)

    class _FakeNusc:
        dataroot = ""

        def get(self, table, token):
            return {"sample_data": sample_data, "ego_pose": ego_pose,
                    "calibrated_sensor": calibrated_sensor}[table][token]

    sample_rec = {"data": {"CAM_FRONT": "sd_cam", "RADAR_FRONT": "sd_r0"}}
    all_pc, all_times = refpc.RadarPointCloudWithVelocity.from_file_multisweep(
        _FakeNusc(), sample_rec, "RADAR_FRONT", "CAM_FRONT", nsweeps=3,
        min_distance=1.0)

    import json as _json

    blob = {
        "records_json": np.frombuffer(_json.dumps({
            "sample_data": sample_data, "ego_pose": ego_pose,
            "calibrated_sensor": calibrated_sensor}).encode(), np.uint8),
        "out_points": np.asarray(all_pc.points),
        "out_times": np.asarray(all_times),
    }
    for name, pts in sweeps.items():
        blob[f"sweep_{name.split('.')[0]}"] = pts
    np.savez(os.path.join(out_dir, "multisweep.npz"), **blob)
    print(f"wrote multisweep.npz ({blob['out_points'].shape[1]} agg points)")


def gen_generic_loss(torch, out_dir):
    """Full-objective goldens by EXECUTING the reference ``GenericLoss``
    orchestrator (genericLoss.py:18-337) — beyond the per-primitive goldens
    (losses.npz) this pins the composition: per-layer target splitting
    (build_targets), layer-scaled index computation, aux lidar/radar
    depth-map losses, uncertainty + decoupled paths, NORM_2D decode of
    widthHeight, GIoU-2D and corner-3D decode losses, per-head weighting
    and the /n_layers total."""
    from model.genericLoss import GenericLoss
    from config import config

    t = torch.from_numpy
    B, M, C = 2, 8, 4
    oh, ow = 12, 20

    ALL_HEADS = {"heatmap": C, "reg": 2, "widthHeight": 2, "depth": 1,
                 "rotation": 8, "dimension": 3, "amodal_offset": 2,
                 "nuscenes_att": 8, "velocity": 3, "depth2": 1,
                 "rotation2": 8}

    def make_outputs(layers, seed, with_unc=False, with_dmap=False):
        r = np.random.RandomState(seed)
        outs = []
        for (h, w) in layers:
            d = {
                "heatmap": 1 / (1 + np.exp(-r.randn(B, C, h, w) * 2)),
                "reg": r.randn(B, 2, h, w),
                "widthHeight": r.randn(B, 2, h, w) * 2,
                "depth": np.abs(r.randn(B, 1, h, w)) * 20 + 1,
                "rotation": r.randn(B, 8, h, w),
                "dimension": np.abs(r.randn(B, 3, h, w)) + 0.5,
                "amodal_offset": r.randn(B, 2, h, w),
                "nuscenes_att": r.randn(B, 8, h, w),
                "velocity": r.randn(B, 3, h, w),
                "depth2": np.abs(r.randn(B, 1, h, w)) * 20 + 1,
                "rotation2": r.randn(B, 8, h, w),
            }
            if with_unc:
                d["uncertainty"] = r.randn(B, 1, h, w) * 3
            if with_dmap:
                d["depthMap"] = r.randn(B, 1, h, w)
            outs.append({k: v.astype(np.float32) for k, v in d.items()})
        return outs

    def make_batch(seed, layers):
        r = np.random.RandomState(seed)
        wh = np.zeros((B, M, 2), np.float32)
        mask = np.zeros((B, M), np.float32)
        n_obj = 6
        for b in range(B):
            for m in range(n_obj):
                # areas straddling the layer thresholds (fracs of oh*ow=240:
                # 0.0018 -> 0.43 px^2, so sides ~0.3-0.6 land in layer 0)
                side = [0.45, 0.6, 2.0, 4.0, 8.0, 0.3][m]
                wh[b, m] = [side * (1 + 0.2 * r.rand()),
                            side * (1 + 0.2 * r.rand())]
                mask[b, m] = 1.0
        # a masked-off row with nonzero wh (must not contribute)
        wh[:, n_obj] = [3.0, 3.0]

        centers = np.stack([r.rand(B, M) * (ow - 1), r.rand(B, M) * (oh - 1)],
                           axis=-1).astype(np.float32)
        batch = {
            "image": np.zeros((B, 3, 4, 4), np.float32),
            "widthHeight": wh,
            "classIds": r.randint(0, C, (B, M)).astype(np.int64),
            "mask": mask,
            "truncMask": (r.rand(B, M) > 0.6).astype(np.float32),
            "depth": (r.rand(B, M, 1) * 40 + 1).astype(np.float32),
            "reg": r.randn(B, M, 2).astype(np.float32),
            "dimension": (np.abs(r.randn(B, M, 3)) + 0.4).astype(np.float32),
            "amodal_offset": r.randn(B, M, 2).astype(np.float32),
            "velocity": r.randn(B, M, 3).astype(np.float32),
            "nuscenes_att": (r.rand(B, M, 8) > 0.7).astype(np.float32),
            "nuscenes_att_mask": (r.rand(B, M, 8) > 0.4).astype(np.float32),
            "rotbin": r.randint(0, 2, (B, M, 2)).astype(np.int64),
            "rotres": (r.randn(B, M, 2) * 0.4).astype(np.float32),
            "calib": np.tile(np.array(
                [[400.0, 0, ow * 2, 0], [0, 400.0, oh * 2, 0], [0, 0, 1, 0]],
                np.float32), (B, 1, 1)),
            "pc_lidar": np.zeros((B, 3, 16), np.float32),
            "pc_2d": np.zeros((B, 3, 10), np.float32),
            "target": {
                "heatCenters": centers,
                "bboxes": np.concatenate(
                    [centers - wh / 2, centers + wh / 2], -1
                ).astype(np.float32),
                "bboxes3d": r.randn(B, M, 8, 3).astype(np.float32) * 5,
            },
        }
        for b in range(B):
            n = 12
            batch["pc_lidar"][b, 0, :n] = r.rand(n) * (ow - 1)
            batch["pc_lidar"][b, 1, :n] = r.rand(n) * (oh - 1)
            batch["pc_lidar"][b, 2, :n] = r.rand(n) * 50 + 1
            n = 7
            batch["pc_2d"][b, 0, :n] = r.rand(n) * (ow - 1)
            batch["pc_2d"][b, 1, :n] = r.rand(n) * (oh - 1)
            batch["pc_2d"][b, 2, :n] = r.rand(n) * 50 + 1

        # layer-split heatmap targets: 1.0 at each object's layer-scaled
        # center in its class channel, background noise elsewhere
        out_area = oh * ow
        fracs = wh[..., 0] * wh[..., 1] / out_area
        thresh = [0, 0.0018, 0.0085][: len(layers)]
        for i, (h, w) in enumerate(layers):
            hm = (r.rand(B, C, h, w) * 0.9).astype(np.float32)
            lo = thresh[i]
            hi = thresh[i + 1] if i + 1 < len(thresh) else np.inf
            sy, sx = h / oh, w / ow
            for b in range(B):
                for m in range(M):
                    if mask[b, m] and lo < fracs[b, m] < hi:
                        cx = int(centers[b, m, 0] * sx)
                        cy = int(centers[b, m, 1] * sy)
                        hm[b, batch["classIds"][b, m], cy, cx] = 1.0
            batch[f"heatmap{i}"] = hm
        batch["meta"] = {
            "center": np.tile(np.array([800.0, 450.0], np.float32), (B, 1)),
            # scalar per image (MAX_CROP semantics, main.py scale = max(h,w))
            "scale": np.full((B,), 1600.0, np.float32),
        }
        return batch

    variants = [
        # (tag, layers, training, weights overrides, flags)
        ("base", [(oh, ow)], False,
         dict(lidar_depth=0.7, radar_depth=0.6, bbox2d=0.0, bbox3d=0.0),
         dict(unc=False, decouple=False, norm2d=False, dmap=True)),
        ("unc", [(oh, ow)], True,
         dict(lidar_depth=0.0, radar_depth=0.0, bbox2d=0.8, bbox3d=0.9),
         dict(unc=True, decouple=True, norm2d=True, dmap=True)),
        ("two", [(oh, ow), (2 * oh, 2 * ow)], False,
         dict(lidar_depth=0.0, radar_depth=0.0, bbox2d=0.0, bbox3d=0.0),
         dict(unc=False, decouple=False, norm2d=False, dmap=False)),
    ]

    blob = {}
    for tag, layers, training, wov, flags in variants:
        weights = {h: 1.0 for h in ALL_HEADS}
        weights.update(heatmap=1.0, depth=1.0, rotation=1.0)
        weights.update(wov)
        config.defrost()
        config.heads = dict(ALL_HEADS)
        if flags["unc"]:
            config.heads["uncertainty"] = 1
        config.weights = dict(weights)
        config.MODEL.OUTPUT_SIZE = (oh, ow)
        config.MODEL.NORM_2D = flags["norm2d"]
        config.TRAIN.UNCERTAINTY_LOSS = flags["unc"]
        config.DATASET.DECOUPLE_REP = flags["decouple"]
        config.LOSS_WEIGHTS.LIDAR_DEPTH = weights["lidar_depth"]
        config.LOSS_WEIGHTS.RADAR_DEPTH = weights["radar_depth"]

        seed = sum(ord(c) for c in tag)  # stable across processes
        outputs = make_outputs(layers, seed=seed,
                               with_unc=flags["unc"], with_dmap=flags["dmap"])
        batch = make_batch(seed=200 + seed, layers=layers)

        loss_fn = GenericLoss(config, num_classes=C)
        loss_fn.train(training)

        def to_t(x):
            if isinstance(x, dict):
                return {k: to_t(v) for k, v in x.items()}
            return t(np.asarray(x))

        with torch.set_grad_enabled(False):
            total, losses = loss_fn([{k: t(v) for k, v in o.items()}
                                     for o in outputs], to_t(batch))

        for li, o in enumerate(outputs):
            for k, v in o.items():
                blob[f"{tag}_out{li}_{k}"] = v
        for k, v in batch.items():
            if k == "target":
                for k2, v2 in v.items():
                    blob[f"{tag}_target_{k2}"] = v2
            elif k == "meta":
                blob[f"{tag}_meta_center"] = v["center"]
                blob[f"{tag}_meta_scale"] = v["scale"]
            else:
                blob[f"{tag}_batch_{k}"] = v
        for k, v in losses.items():
            blob[f"{tag}_loss_{k}"] = np.float64(float(v))
        blob[f"{tag}_loss_total_ret"] = np.float64(float(total))
        blob[f"{tag}_weights"] = np.array(
            [f"{k}={v}" for k, v in sorted(weights.items())])
        blob[f"{tag}_nlayers"] = np.int64(len(layers))
    np.savez(os.path.join(out_dir, "generic_loss.npz"), **blob)
    print(f"wrote generic_loss.npz ({len(blob)} arrays)")


class _FaithfulQuaternion:
    """Minimal pyquaternion.Quaternion: Hamilton product + rotation matrix.
    Transcribed public semantics — only what getEvalFormatItem touches."""

    def __init__(self, q=None, axis=None, angle=None, radians=None):
        if q is not None:
            if isinstance(q, _FaithfulQuaternion):
                q = q.q
            self.q = np.asarray(q, np.float64)
        else:
            ang = float(angle if angle is not None else radians)
            ax = np.asarray(axis, np.float64)
            ax = ax / np.linalg.norm(ax)
            self.q = np.concatenate(
                [[np.cos(ang / 2.0)], np.sin(ang / 2.0) * ax])

    @property
    def rotation_matrix(self):
        w, x, y, z = self.q / np.linalg.norm(self.q)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    def __mul__(self, other):
        w1, x1, y1, z1 = self.q
        w2, x2, y2, z2 = other.q
        return _FaithfulQuaternion(q=[
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])


class _FaithfulBox:
    """Minimal devkit nuscenes.utils.data_classes.Box: translate/rotate."""

    def __init__(self, center, size, orientation, name=None, token=None):
        self.center = np.asarray(center, np.float64).copy()
        self.wlh = np.asarray(size, np.float64).copy()
        self.orientation = orientation

    def translate(self, x):
        self.center = self.center + np.asarray(x, np.float64)

    def rotate(self, quaternion):
        self.center = quaternion.rotation_matrix @ self.center
        self.orientation = quaternion * self.orientation


def gen_eval_format(torch, out_dir):
    """Submission-conversion goldens by EXECUTING the reference
    ``convert_eval_format``/``getEvalFormatItem`` (nuscenes.py:416-557) with
    faithful pyquaternion/Box replacements: camera->global translation and
    quaternion chains (Box rotate composition), per-class attribute argmax
    groups, the 2-vector velocity passthrough vs 3-vector rotation path, and
    per-sample score-sorted truncation."""
    import dataset.datasets.nuscenes as refnusc
    from config import config

    # the module was imported with devkit stubs = object; rebind the two
    # names getEvalFormatItem actually executes to faithful implementations
    refnusc.Quaternion = _FaithfulQuaternion
    refnusc.Box = _FaithfulBox

    rs = np.random.RandomState(71)
    config.defrost()
    config.DATASET.RADAR_PC = True
    ds = refnusc.nuScenes.__new__(refnusc.nuScenes)
    ds.config = config

    def pose_chain(rs):
        """cs/pose records + the composed 4x4 trans/velocity matrices the
        converter would have written (convert_nuScenes.py:168-194)."""
        def rt(q, t):
            m = np.eye(4)
            m[:3, :3] = _FaithfulQuaternion(q=q).rotation_matrix
            m[:3, 3] = t
            return m

        def rq(yaw, pitch):
            a = _FaithfulQuaternion(axis=[0, 0, 1], angle=yaw)
            b = _FaithfulQuaternion(axis=[0, 1, 0], angle=pitch)
            return (a * b).q

        cs_rot = rq(rs.uniform(-np.pi, np.pi), rs.uniform(-0.1, 0.1))
        cs_trans = rs.randn(3) * [1.5, 1.5, 0.5] + [0, 0, 1.5]
        pose_rot = rq(rs.uniform(-np.pi, np.pi), rs.uniform(-0.02, 0.02))
        pose_trans = rs.randn(3) * [300, 300, 0.2]
        trans = rt(pose_rot, pose_trans) @ rt(cs_rot, cs_trans)
        vel = rt(pose_rot, [0, 0, 0]) @ rt(cs_rot, [0, 0, 0])
        return {
            "cs_record_rot": cs_rot.tolist(),
            "cs_record_trans": cs_trans.tolist(),
            "pose_record_rot": pose_rot.tolist(),
            "pose_record_trans": pose_trans.tolist(),
            "trans_matrix": trans.tolist(),
            "velocity_trans_matrix": vel.tolist(),
        }

    # 4 images over 2 sample tokens (two cameras each) — merged per token
    infos = {}
    for img_id, (token, sensor) in enumerate(
            [("tokA", 1), ("tokA", 2), ("tokB", 1), ("tokB", 4)], start=1):
        infos[img_id] = {"id": img_id, "sample_token": token,
                         "sensor_id": sensor, **pose_chain(rs)}

    class _FakeCoco:
        def loadImgs(self, ids):
            return [infos[i] for i in ids]

    ds.coco = _FakeCoco()
    ds.images = list(infos.keys())

    classes = ["car", "pedestrian", "bicycle", "traffic_cone", "barrier",
               "truck"]
    t = torch.from_numpy
    results, results_json = {}, {}
    score_pool = [0.9, 0.5, 0.5, 0.8, 0.3, 0.5]  # deliberate ties
    for img_id in ds.images:
        items, items_json = [], []
        for j, cname in enumerate(classes):
            item = {
                "class": refnusc.nuScenes.class_name.index(cname) + 1,
                "score": score_pool[(j + img_id) % len(score_pool)],
                "dimension": rs.rand(3).astype(np.float32) * 2 + 0.3,
                "location": (rs.randn(3) * [8, 1.5, 15]
                             + [0, 1, 25]).astype(np.float32),
                "yaw": np.float32(rs.uniform(-np.pi, np.pi)),
                "nuscenes_att": rs.rand(8).astype(np.float32),
                "velocity": rs.randn(3).astype(np.float32),
            }
            if j == 3:
                item.pop("nuscenes_att")  # no-attribute branch
            if j == 4:
                item["velocity"] = rs.randn(2).astype(np.float32)  # passthru
            items_json.append({k: (v.tolist() if hasattr(v, "tolist") else v)
                               for k, v in item.items()})
            items.append({k: (t(v) if isinstance(v, np.ndarray)
                              else torch.tensor(v)
                              if isinstance(v, np.floating) else v)
                          for k, v in item.items()})
        results[img_id] = items
        results_json[str(img_id)] = items_json

    ret = ds.convert_eval_format(results)

    import json as _json

    blob = {
        "inputs_json": np.frombuffer(
            _json.dumps({"infos": {str(k): v for k, v in infos.items()},
                         "results": results_json}).encode(), np.uint8),
        # reference records may carry raw torch tensors (the 2-vector
        # velocity passthrough returns item["velocity"] unconverted)
        "output_json": np.frombuffer(
            _json.dumps(ret, default=lambda v: v.tolist()
                        if hasattr(v, "tolist") else float(v)).encode(),
            np.uint8),
    }
    np.savez(os.path.join(out_dir, "eval_format.npz"), **blob)
    n = sum(len(v) for v in ret["results"].values())
    print(f"wrote eval_format.npz ({n} submission records)")


def gen_model(torch, out_dir, node="Conv", fusion="middle", tag="",
              frustum=False, offset_scale=0.05, offset_bias=0.0,
              calibrate_bn=0):
    """FULL-MODEL golden: run the reference DLASeg (Conv/GlobalConv nodes —
    no torchvision needed) in eval mode on seeded inputs and save its
    state_dict + outputs.

    This is the end-to-end parity artifact: the matching test imports the
    state_dict through ``training.checkpoint.import_torch_checkpoint`` and
    asserts our flax model reproduces every head output — validating the
    checkpoint importer, DLA backbone, neck, BN statistics handling, and
    head towers against the actual torch reference in one shot
    (dla.py:164-635, base_model.py:30-106, detectHeads.py:32-132).
    With ``frustum=False`` pc_hm is the deterministic eval normalization of
    pc_dep (base_model.py:67-79). Variants: middle fusion (secondary
    heads), early fusion (input concat), GlobalConv nodes.

    ``frustum=True`` captures the full two-stage eval composition the
    project exists for: first-stage heads -> predicted boxes -> frustum
    pc_hm from pc_dep -> secondary towers -> depth2/rotation2 overrides
    (detectHeads.py:165-190). Frustum changes only the eval data flow, not
    the parameters, so with the same torch seed the state_dict is identical
    to the frustum=False variant — these fixtures store inputs/outputs plus
    an sd checksum and reuse the base fixture's weights at test time.

    ``offset_scale``/``offset_bias`` control the DCN offset-conv
    perturbation: scale is the weight std; bias draws the 18 offset-channel
    biases from N(0, offset_bias), which drives offsets of that magnitude
    (in output px) through EVERY node regardless of feature statistics —
    the "wide" fixture uses this to prove exact-DCN parity at realistic
    trained-offset magnitudes (~1.5 px), not just near zero.

    ``calibrate_bn=N``: run N train-mode forward passes on seeded random
    batches (no_grad) so the BN running stats calibrate to the real
    activation distribution before the eval capture. Random-init eval-mode
    BN (running mean 0 / var 1) lets activation variance decay
    multiplicatively through the depth, leaving the DCN input features
    near-flat (std 1e-4..1e-2 — the PARITY caveat on the wide fixtures);
    calibrated stats restore O(0.1-1) feature std so a fixture actually
    PRICES the fast paths' offset clamp under loud features (VERDICT r4
    next #6). The per-node DCN input stds are recorded in the blob
    (``dcn_input_std_*``) so the matching test can assert non-vacuousness.
    """
    from config import config, updateDatasetAndModelConfig
    from model.model import getModel
    import model.networks.dla as ref_dla

    # upstream bug: IDAUp passes activation=True to proj nodes but the
    # reference's Conv.__init__ doesn't accept it (dla.py:315,499) — the
    # NODE=Conv path crashes as shipped. Conv is unconditionally
    # BN+ReLU-activated, so an activation-swallowing shim is faithful.
    class _ConvShim(ref_dla.Conv):
        def __init__(self, cin, cout, activation=True):
            super().__init__(cin, cout)

    class _GlobalShim(ref_dla.GlobalConv):
        def __init__(self, cin, cout, activation=True):
            super().__init__(cin, cout)

    ref_dla.DLA_NODE["Conv"] = (_ConvShim, _ConvShim)
    ref_dla.DLA_NODE["GlobalConv"] = (_ConvShim, _GlobalShim)

    config.defrost()
    config.DATASET.DATASET = "nuscenes"
    config.DATASET.RADAR_PC = True
    config.DATASET.MAX_PC_DIST = 60.0
    config.MODEL.FUSION_STRATEGY = fusion
    config.MODEL.FRUSTUM = bool(frustum)
    config.MODEL.K = 100
    config.MODEL.DLA.NODE = node
    config.MODEL.INPUT_SIZE = (64, 128)
    config.MODEL.LOAD_DIR = "skip-imagenet-download"  # getModel: pretrained
    config.TRAIN.UNCERTAINTY_LOSS = False             # only when LOAD_DIR==""
    config.DEBUG = 0

    class _FakeDS:
        num_categories = 10
        default_resolution = (64, 128)

    updateDatasetAndModelConfig(config, _FakeDS)

    torch.manual_seed(7)
    model = getModel(config)
    model.eval()
    if node == "DeformConv":
        # conv_offset_mask is zero-init (dla.py:426-436): offsets would be
        # zero and masks 0.5, exercising only the degenerate path. Give the
        # offset convs small random weights so real fractional sampling
        # flows through the golden.
        with torch.no_grad():
            gen = torch.Generator().manual_seed(23)
            for name, p_ in model.named_parameters():
                if "conv_offset_mask" not in name:
                    continue
                if name.endswith(".bias") and offset_bias:
                    # first 18 of 27 output channels are (dy, dx) pairs;
                    # the last 9 are the mask logits (dla.py:426-436)
                    p_[:18] = torch.randn(18, generator=gen) * offset_bias
                elif name.endswith(".weight"):
                    p_.normal_(0.0, offset_scale, generator=gen)

        # record the offsets the golden actually exercises (mean over
        # nodes of the per-node std of the 18 offset channels)
        offset_stds = []

        def _grab(mod, inp, out):
            offset_stds.append(float(out[:, :18].std()))

        hooks = [m.register_forward_hook(_grab)
                 for n_, m in model.named_modules()
                 if n_.endswith("conv_offset_mask")]

    rs = np.random.RandomState(17)
    b = 2
    oh, ow = config.MODEL.OUTPUT_SIZE
    img = rs.randn(b, 3, 64, 128).astype(np.float32)
    pc_dep = np.abs(rs.randn(b, 3, oh, ow)).astype(np.float32) * 30
    calib = np.tile(
        np.array([[400.0, 0, 64, 0], [0, 400.0, 32, 0], [0, 0, 1, 0]],
                 np.float32), (b, 1, 1),
    )
    t = torch.from_numpy

    if calibrate_bn:
        cal_rs = np.random.RandomState(31)
        model.train()
        with torch.no_grad():
            for _ in range(int(calibrate_bn)):
                ci = cal_rs.randn(b, 3, 64, 128).astype(np.float32)
                cp = (np.abs(cal_rs.randn(b, 3, oh, ow)).astype(np.float32)
                      * 30)
                # train mode consumes the GT-painted pc_hm directly
                # (base_model.py:67-79 eval normalization is skipped)
                model(t(ci), pc_hm=t(cp / 60.0), pc_dep=t(cp.copy()),
                      calib=t(calib))
        model.eval()

    feat_stds = []
    fhooks = []
    if node == "DeformConv":
        def _grab_feat(mod, inp, out):
            feat_stds.append(float(inp[0].std()))

        fhooks = [m.register_forward_hook(_grab_feat)
                  for m in model.modules()
                  if isinstance(m, ref_dla.DeformConv)]
    with torch.no_grad():
        # .copy(): BaseModel.forward normalizes pc_dep IN PLACE
        # (base_model.py:74-78) and from_numpy shares memory — without the
        # copy the saved input would silently be the normalized version
        outs = model(t(img), pc_hm=None, pc_dep=t(pc_dep.copy()),
                     calib=t(calib))
    blob = {"in_img": img, "in_pc_dep": pc_dep, "in_calib": calib}
    if node == "DeformConv":
        for h_ in hooks + fhooks:
            h_.remove()
        blob["offset_std"] = np.float64(np.mean(offset_stds))
        blob["dcn_input_std_mean"] = np.float64(np.mean(feat_stds))
        blob["dcn_input_std_min"] = np.float64(np.min(feat_stds))
        print(f"  DCN offset std through the net: {np.mean(offset_stds):.3f} px"
              f" | input feature std mean {np.mean(feat_stds):.4f}"
              f" min {np.min(feat_stds):.4f}")
    for k, v in outs[-1].items():
        if hasattr(v, "detach"):
            blob[f"out_{k}"] = v.detach().numpy()
    sd = model.state_dict()
    if frustum:
        # weights identical to the frustum=False base fixture (same seed,
        # same architecture) — store a checksum instead of 70 MB of sd
        blob["sd_checksum"] = np.float64(
            sum(float(v.double().sum()) for v in sd.values())
        )
    else:
        for k, v in sd.items():
            blob[f"sd_{k}"] = v.detach().numpy()
    head_conv = {k: list(v) for k, v in dict(config.head_conv).items()}
    import json as _json

    blob["meta_head_conv"] = np.frombuffer(
        _json.dumps(head_conv).encode(), dtype=np.uint8
    )
    name = f"model_forward{tag}.npz"
    np.savez_compressed(os.path.join(out_dir, name), **blob)
    print(f"wrote {name} ({len(blob)} arrays, "
          f"{len(sd)} sd keys)")


def gen_optimizer(torch, out_dir):
    """Optimizer micro-golden: EXECUTE torch.optim.AdamW / SGD for three
    steps on a fixed parameter tensor and fixed gradient sequence
    (modelWithLoss.py:66-77 — AdamW(lr, weight_decay=5e-4) and
    SGD(lr, momentum=0.9, weight_decay=5e-4)) and record the parameter
    trajectory. Pins decoupled-vs-coupled weight decay, Adam bias
    correction, the eps placement (outside the sqrt), and SGD's
    momentum-buffer coupling of weight decay — the exact update math our
    optax chain (training/state.py:48-62) must reproduce."""
    rs = np.random.RandomState(99)
    p0 = (rs.randn(4, 5) * 0.5).astype(np.float32)
    grads = (rs.randn(3, 4, 5) * 0.3).astype(np.float32)
    lr, wd = 2.5e-4, 5e-4

    blob = {"p0": p0, "grads": grads,
            "lr": np.float64(lr), "wd": np.float64(wd)}
    for name, make in (
        ("adamw", lambda p: torch.optim.AdamW([p], lr, weight_decay=wd)),
        ("sgd", lambda p: torch.optim.SGD([p], lr, momentum=0.9,
                                          weight_decay=wd)),
    ):
        p = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = make(p)
        traj = []
        for t in range(grads.shape[0]):
            opt.zero_grad()
            p.grad = torch.from_numpy(grads[t].copy())
            opt.step()
            traj.append(p.detach().numpy().copy())
        blob[f"traj_{name}"] = np.stack(traj)
    np.savez(os.path.join(out_dir, "optimizer.npz"), **blob)
    print(f"wrote optimizer.npz ({len(blob)} arrays)")


def gen_train_step(torch, out_dir, node="Conv", tag="",
                   offset_scale=0.0, offset_bias=0.0):
    """FULL TRAIN-STEP golden: execute one complete reference training step
    — DLASeg forward in TRAIN mode (batch-stat BN, in-place running-stat
    updates), GenericLoss on a realistic target batch, ``backward()``, and
    one ``torch.optim.AdamW`` step (modelWithLoss.py:43-77,299) — and
    record the loss dict, per-parameter gradient norms, full gradients and
    post-step values for a representative parameter subset, and the
    post-forward BN running statistics.

    This is the one parity axis the forward goldens cannot see: autodiff
    through every layer (incl. train-mode BN batch statistics and, in the
    DCN variant, bilinear-sample gradients wrt offsets/masks), the loss
    backward, and the optimizer update. Weights are identical to the
    matching ``model_forward{tag}.npz`` fixture (same torch seed /
    perturbation), so only a checksum is stored here — the test imports
    that fixture's state_dict.

    A second, FLOAT64 pass through an identical-weights clone anchors the
    fixture: deep-backward gradients accumulate f32 summation noise
    (measured ~1% of max|g| at the stem), so the test compares the JAX f32
    gradients against the f64 anchor with a tolerance calibrated from
    torch's OWN f32-vs-f64 deviation — any mismatch beyond a small multiple
    of torch's self-noise is semantic, not numeric.
    """
    import copy
    import re

    from config import config, updateDatasetAndModelConfig
    from model.genericLoss import GenericLoss
    from model.model import getModel
    import model.networks.dla as ref_dla

    # same activation-swallowing node shims as gen_model (upstream Conv
    # signature bug, dla.py:315,499)
    class _ConvShim(ref_dla.Conv):
        def __init__(self, cin, cout, activation=True):
            super().__init__(cin, cout)

    ref_dla.DLA_NODE["Conv"] = (_ConvShim, _ConvShim)

    config.defrost()
    config.DATASET.DATASET = "nuscenes"
    config.DATASET.RADAR_PC = True
    config.DATASET.MAX_PC_DIST = 60.0
    config.DATASET.DECOUPLE_REP = False
    config.MODEL.FUSION_STRATEGY = "middle"
    config.MODEL.FRUSTUM = False
    config.MODEL.K = 100
    config.MODEL.DLA.NODE = node
    config.MODEL.INPUT_SIZE = (64, 128)
    config.MODEL.NORM_2D = False
    config.MODEL.LOAD_DIR = "skip-imagenet-download"
    config.TRAIN.UNCERTAINTY_LOSS = False
    config.DEBUG = 0
    # aux point-cloud depth losses ON: they route gradient into the raw
    # depthMap alias (genericLoss.py:143-195), widening backward coverage
    config.LOSS_WEIGHTS.LIDAR_DEPTH = 0.7
    config.LOSS_WEIGHTS.RADAR_DEPTH = 0.6
    config.LOSS_WEIGHTS.BBOX_2D = 0.0
    config.LOSS_WEIGHTS.BBOX_3D = 0.0

    class _FakeDS:
        num_categories = 10
        default_resolution = (64, 128)

    updateDatasetAndModelConfig(config, _FakeDS)

    torch.manual_seed(7)
    model = getModel(config)
    pert = {}
    if node == "DeformConv" and (offset_scale or offset_bias):
        # MILD perturbation (realistic trained-offset magnitudes, ~0.3-1 px
        # — see PARITY.md's measured table). The "wide" regime used by the
        # forward goldens drives the depth head's 1/sigmoid(x)-1 into an
        # exponentially ill-conditioned zone where even torch's own f32
        # backward deviates ~11% from its f64 run — gradients there are
        # noise on any f32 implementation. The perturbed offset-conv
        # tensors are stored in the fixture (pert_* keys) so the test can
        # rebuild this exact state_dict on top of the base forward fixture.
        with torch.no_grad():
            gen = torch.Generator().manual_seed(23)
            for name, p_ in model.named_parameters():
                if "conv_offset_mask" not in name:
                    continue
                if name.endswith(".bias") and offset_bias:
                    p_[:18] = torch.randn(18, generator=gen) * offset_bias
                elif name.endswith(".weight"):
                    p_.normal_(0.0, offset_scale, generator=gen)
                pert[name] = p_.detach().numpy().copy()
    model.train()

    # identical-weights float64 clone for the noise-calibration anchor
    model64 = copy.deepcopy(model).double()
    model64.train()

    sd0 = model.state_dict()
    checksum = np.float64(sum(float(v.double().sum()) for v in sd0.values()))

    # ---- realistic target batch at output resolution (16, 32) ----
    rs = np.random.RandomState(31)
    B, M, C = 2, 16, 10
    oh, ow = config.MODEL.OUTPUT_SIZE
    n_obj = 12

    img = rs.randn(B, 3, 64, 128).astype(np.float32)
    pc_dep = (np.abs(rs.randn(B, 3, oh, ow)) * 30).astype(np.float32)
    pc_hm = np.stack([
        rs.rand(B, oh, ow),                 # normalized depth channel
        rs.randn(B, oh, ow) * 0.5,          # vx
        rs.randn(B, oh, ow) * 0.5,          # vz
    ], axis=1).astype(np.float32)
    calib = np.tile(np.array(
        [[400.0, 0, 64, 0], [0, 400.0, 32, 0], [0, 0, 1, 0]], np.float32),
        (B, 1, 1))

    wh = np.zeros((B, M, 2), np.float32)
    mask = np.zeros((B, M), np.float32)
    wh[:, :n_obj] = (rs.rand(B, n_obj, 2) * 5.5 + 0.5).astype(np.float32)
    mask[:, :n_obj] = 1.0
    wh[:, n_obj] = [3.0, 3.0]  # masked-off row: must not contribute

    centers = np.stack([rs.rand(B, M) * (ow - 1), rs.rand(B, M) * (oh - 1)],
                       axis=-1).astype(np.float32)
    class_ids = rs.randint(0, C, (B, M)).astype(np.int64)
    batch = {
        "image": img,
        "pc_hm": pc_hm,
        "pc_dep": pc_dep,
        "calib": calib,
        "widthHeight": wh,
        "classIds": class_ids,
        "mask": mask,
        "truncMask": (rs.rand(B, M) > 0.6).astype(np.float32),
        "depth": (rs.rand(B, M, 1) * 40 + 1).astype(np.float32),
        "reg": rs.randn(B, M, 2).astype(np.float32),
        "dimension": (np.abs(rs.randn(B, M, 3)) + 0.4).astype(np.float32),
        "amodal_offset": rs.randn(B, M, 2).astype(np.float32),
        "velocity": rs.randn(B, M, 3).astype(np.float32),
        "nuscenes_att": (rs.rand(B, M, 8) > 0.7).astype(np.float32),
        "nuscenes_att_mask": (rs.rand(B, M, 8) > 0.4).astype(np.float32),
        "rotbin": rs.randint(0, 2, (B, M, 2)).astype(np.int64),
        "rotres": (rs.randn(B, M, 2) * 0.4).astype(np.float32),
        "pc_lidar": np.zeros((B, 3, 24), np.float32),
        "pc_2d": np.zeros((B, 3, 12), np.float32),
        "target": {
            "heatCenters": centers,
            "bboxes": np.concatenate(
                [centers - wh / 2, centers + wh / 2], -1).astype(np.float32),
            "bboxes3d": (rs.randn(B, M, 8, 3) * 5).astype(np.float32),
        },
    }
    for b in range(B):
        n = 18
        batch["pc_lidar"][b, 0, :n] = rs.rand(n) * (ow - 1.5) + 0.3
        batch["pc_lidar"][b, 1, :n] = rs.rand(n) * (oh - 1.5) + 0.3
        batch["pc_lidar"][b, 2, :n] = rs.rand(n) * 50 + 1
        n = 9
        batch["pc_2d"][b, 0, :n] = rs.rand(n) * (ow - 1.5) + 0.3
        batch["pc_2d"][b, 1, :n] = rs.rand(n) * (oh - 1.5) + 0.3
        batch["pc_2d"][b, 2, :n] = rs.rand(n) * 50 + 1

    hm = (rs.rand(B, C, oh, ow) * 0.9).astype(np.float32)
    for b in range(B):
        for m in range(M):
            if mask[b, m]:
                hm[b, class_ids[b, m],
                   int(centers[b, m, 1]), int(centers[b, m, 0])] = 1.0
    batch["heatmap0"] = hm

    t = torch.from_numpy

    def to_t(x):
        if isinstance(x, dict):
            return {k: to_t(v) for k, v in x.items()}
        return t(np.asarray(x))

    batch_t = to_t(batch)

    # ---- intermediate-activation capture (layer-level bisect aid) ----
    # full train-mode feature maps of the backbone levels and every neck
    # submodule (proj/up/node and their offset convs) in BOTH precisions:
    # the test localizes any semantic divergence to the first bad layer
    # instead of observing it smeared over every downstream gradient.
    def _hook_all(m, store):
        pat = re.compile(r"^(base\.level\d+|dla_up\..*|ida_up\..*)$")
        hs = []
        for nm, mod in m.named_modules():
            if not nm or not pat.match(nm):
                continue
            if next(mod.children(), None) is not None and \
                    "conv_offset_mask" not in nm:
                continue  # leaf modules only, except whole DCN nodes below

            def fn(mod_, inp, out, nm=nm):
                if torch.is_tensor(out):
                    store[nm] = out.detach().numpy().copy()
            hs.append(mod.register_forward_hook(fn))
        # whole aggregation-node outputs (post-BN/ReLU)
        pat2 = re.compile(
            r"^(dla_up\.ida_\d+\.(proj|node|up)_\d+|ida_up\.(proj|node|up)_\d+)$")
        for nm, mod in m.named_modules():
            if pat2.match(nm):
                def fn2(mod_, inp, out, nm=nm):
                    if torch.is_tensor(out):
                        store[nm] = out.detach().numpy().copy()
                hs.append(mod.register_forward_hook(fn2))
        return hs

    acts, acts64 = {}, {}
    hooks = _hook_all(model, acts) + _hook_all(model64, acts64)

    # ---- forward (train mode) + loss + backward + AdamW step ----
    outs = model(batch_t["image"], pc_hm=batch_t["pc_hm"],
                 pc_dep=batch_t["pc_dep"], calib=batch_t["calib"])
    loss_fn = GenericLoss(config, num_classes=C)
    loss_fn.train(True)
    total, losses = loss_fn(outs, batch_t)
    total.backward()

    names, grad_norms, grads = [], [], {}
    for n, p_ in model.named_parameters():
        names.append(n)
        g = (p_.grad if p_.grad is not None
             else torch.zeros_like(p_)).detach()
        grads[n] = g
        grad_norms.append(float(torch.linalg.vector_norm(g.double())))

    # ---- float64 anchor pass (identical weights, identical batch) ----
    def to_t64(x):
        if isinstance(x, dict):
            return {k: to_t64(v) for k, v in x.items()}
        tt = t(np.asarray(x))
        return tt.double() if tt.is_floating_point() else tt

    batch64 = to_t64(batch)
    outs64 = model64(batch64["image"], pc_hm=batch64["pc_hm"],
                     pc_dep=batch64["pc_dep"], calib=batch64["calib"])
    loss_fn64 = GenericLoss(config, num_classes=C).double()
    loss_fn64.train(True)
    total64, losses64 = loss_fn64(outs64, batch64)
    total64.backward()
    grads64, grad_norms64 = {}, []
    for n, p_ in model64.named_parameters():
        g = (p_.grad if p_.grad is not None
             else torch.zeros_like(p_)).detach()
        grads64[n] = g
        grad_norms64.append(float(torch.linalg.vector_norm(g)))
    for h in hooks:
        h.remove()

    # post-forward BN running statistics (updated in place by the forward),
    # from BOTH precisions: the f32 model's batch statistics carry its own
    # forward noise (~1e-5 relative at deep layers), so only the f64
    # clone's stats support a tight anchor comparison
    sd1 = model.state_dict()
    sd1_64 = model64.state_dict()
    bn_names = [k for k in sd1
                if k.endswith("running_mean") or k.endswith("running_var")]
    bn_norms = [float(torch.linalg.vector_norm(sd1[k].double()))
                for k in bn_names]
    bn_norms64 = [float(torch.linalg.vector_norm(sd1_64[k]))
                  for k in bn_names]
    bn_full = bn_names[:2] + bn_names[-2:]

    # representative subset: stem, tree conv, BN affine, neck node conv,
    # bilinear up, head towers (+ DCN offset conv when present)
    pats = [
        r"^base\.base_layer\.0\.weight$",
        r"^base\.level0\.0\.weight$",
        r"^base\.level2\..*conv1\.weight$",
        r"^base\.level2\..*bn1\.weight$",
        r"^base\.level2\..*bn1\.bias$",
        r"^dla_up\..*conv\.weight$",
        r"^dla_up\..*actf\.0\.weight$",
        r"^ida_up\..*up_.*\.weight$",
        r"heatmap\.\d+\.weight$",
        r"heatmap\.\d+\.bias$",
        r"velocity\..*\.weight$",
        r"depth2\..*\.weight$",
        r"conv_offset_mask\.weight$",
        r"conv_offset_mask\.bias$",
    ]
    chosen = []
    for pat in pats:
        for n in names:
            if re.search(pat, n) and n not in chosen:
                chosen.append(n)
                break

    lr = 2.5e-4
    opt = torch.optim.AdamW(model.parameters(), lr, weight_decay=5e-4)
    opt.step()
    sd_post = {n: p_.detach().numpy().copy()
               for n, p_ in model.named_parameters()}
    # f64 AdamW step on the anchor clone: at t=1 Adam's update is
    # ~lr*sign(g), so noise-floor f32 gradient sign flips shift post-step
    # values by ~2*lr — an f64-vs-f64 post comparison is the only tight one
    opt64 = torch.optim.AdamW(model64.parameters(), lr, weight_decay=5e-4)
    opt64.step()
    sd_post64 = {n: p_.detach().numpy().copy()
                 for n, p_ in model64.named_parameters()}

    blob = {"in_img": img, "in_pc_dep": pc_dep, "in_pc_hm": pc_hm,
            "in_calib": calib, "sd_checksum": checksum,
            "lr": np.float64(lr)}
    for k, v in acts.items():
        blob[f"act_{k}"] = v
    for k, v in acts64.items():
        blob[f"act64_{k}"] = v
    for k, v in outs[-1].items():
        if torch.is_tensor(v):
            blob[f"fwd_{k}"] = v.detach().numpy().copy()
            blob[f"fwd64_{k}"] = outs64[-1][k].detach().numpy().copy()
    for k, v in pert.items():
        blob[f"pert_{k}"] = v
    for k, v in batch.items():
        if k in ("image", "pc_hm", "pc_dep", "calib"):
            continue
        if k == "target":
            for k2, v2 in v.items():
                blob[f"target_{k2}"] = v2
        else:
            blob[f"batch_{k}"] = v
    for k, v in losses.items():
        blob[f"loss_{k}"] = np.float64(float(v))
    blob["loss_total_ret"] = np.float64(float(total))
    for k, v in losses64.items():
        blob[f"loss64_{k}"] = np.float64(float(v))
    blob["loss64_total_ret"] = np.float64(float(total64))
    blob["grad_names"] = np.array(names)
    blob["grad_norms"] = np.array(grad_norms, np.float64)
    blob["grad_norms64"] = np.array(grad_norms64, np.float64)
    blob["bnstat_names"] = np.array(bn_names)
    blob["bnstat_norms"] = np.array(bn_norms, np.float64)
    blob["bnstat_norms64"] = np.array(bn_norms64, np.float64)
    for k in bn_full:
        blob[f"bnfull_{k}"] = sd1[k].numpy().copy()
        blob[f"bnfull64_{k}"] = sd1_64[k].numpy().copy()
    blob["sub_names"] = np.array(chosen)
    for i, n in enumerate(chosen):
        blob[f"subgrad_{i}"] = grads[n].numpy().copy()
        blob[f"subgrad64_{i}"] = grads64[n].numpy().copy()
        blob[f"subpost_{i}"] = sd_post[n]
        blob[f"subpost64_{i}"] = sd_post64[n]
    name = f"train_step{tag}.npz"
    np.savez_compressed(os.path.join(out_dir, name), **blob)
    print(f"wrote {name} ({len(blob)} arrays, {len(chosen)} subset params, "
          f"loss={float(total):.4f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/src/lib")
    ap.add_argument("--only", default=None,
                    help="comma-separated generator suffixes to run "
                         "(e.g. 'train_step,optimizer'); default: all")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "tests",
                             "fixtures"),
    )
    args = ap.parse_args()

    import torch

    torch.manual_seed(0)
    install_stubs()
    sys.path.insert(0, os.path.abspath(args.ref))
    # tune_mode_convbn lives one level up (src/), mirroring _init_paths.py
    sys.path.insert(0, os.path.dirname(os.path.abspath(args.ref)))
    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)

    generators = [
        ("decode", lambda: gen_decode(torch, out_dir)),
        ("losses", lambda: gen_losses(torch, out_dir)),
        ("schedule", lambda: gen_schedule(torch, out_dir)),
        ("convbn", lambda: gen_convbn(torch, out_dir)),
        ("dcn", lambda: gen_dcn(torch, out_dir)),
        ("frustum", lambda: gen_frustum(torch, out_dir)),
        ("geometry", lambda: gen_geometry(torch, out_dir)),
        ("postprocess", lambda: gen_postprocess(torch, out_dir)),
        ("radar", lambda: gen_radar(torch, out_dir)),
        ("targets", lambda: gen_targets(torch, out_dir)),
        ("eval_accumulate", lambda: gen_eval_accumulate(torch, out_dir)),
        ("eval_format", lambda: gen_eval_format(torch, out_dir)),
        ("generic_loss", lambda: gen_generic_loss(torch, out_dir)),
        ("multisweep", lambda: gen_multisweep(torch, out_dir)),
        ("eval_filter", lambda: gen_eval_filter(torch, out_dir)),
        ("detector_preprocess",
         lambda: gen_detector_preprocess(torch, out_dir)),
        ("legacy_names", lambda: gen_legacy_names(torch, out_dir)),
        ("optimizer", lambda: gen_optimizer(torch, out_dir)),
        ("model", lambda: gen_model(torch, out_dir)),
        ("model", lambda: gen_model(torch, out_dir, node="GlobalConv",
                                    tag="_globalconv")),
        ("model", lambda: gen_model(torch, out_dir, fusion="early",
                                    tag="_early")),
        ("model", lambda: gen_model(torch, out_dir, node="DeformConv",
                                    tag="_dcn")),
        ("model", lambda: gen_model(torch, out_dir, frustum=True,
                                    tag="_frustum")),
        ("model", lambda: gen_model(torch, out_dir, node="DeformConv",
                                    tag="_dcn_wide",
                                    offset_scale=0.3, offset_bias=1.5)),
        ("model", lambda: gen_model(torch, out_dir, node="DeformConv",
                                    frustum=True, tag="_dcn_wide_frustum",
                                    offset_scale=0.3, offset_bias=1.5)),
        ("model", lambda: gen_model(torch, out_dir, node="DeformConv",
                                    frustum=True, tag="_dcn_frustum")),
        # loud-feature clamp-pricing fixture: BN running stats calibrated
        # by train-mode passes so the DCN inputs carry O(0.1-1) std and the
        # fast paths' ±1 px clamp produces a NON-vacuous delta
        # offset_scale stays at the small default: with calibrated (loud)
        # features a 0.3-scale offset conv drives ~7.5 px offsets —
        # far past anything trained (overfit run p99 ~1.5 px shallow); the
        # bias term alone pins the realistic ~1.5 px magnitude
        ("model_loud", lambda: gen_model(torch, out_dir, node="DeformConv",
                                         tag="_dcn_loud", offset_scale=0.02,
                                         offset_bias=1.5, calibrate_bn=8)),
        ("train_step", lambda: gen_train_step(torch, out_dir)),
        ("train_step", lambda: gen_train_step(
            torch, out_dir, node="DeformConv", tag="_dcn",
            offset_scale=0.05, offset_bias=0.4)),
    ]
    only = (set(s.strip() for s in args.only.split(","))
            if args.only else None)
    for name, thunk in generators:
        if only is None or name in only:
            thunk()


if __name__ == "__main__":
    main()
