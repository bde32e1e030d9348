"""Training / evaluation CLI.

Mirrors the reference entry point (/root/reference/src/main.py:19-131):
``python -m centerfusiondetect3d_tpu.main --cfg configs/CenterNet.yaml
[KEY VALUE ...]`` - config resolution, dataset + model construction,
parameter census by module group, train-or-eval dispatch, loss plots.
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="CenterFusionDetect3D-TPU")
    p.add_argument("--cfg", default=None, help="yaml config file")
    p.add_argument("opts", nargs="*", default=[], help="KEY VALUE overrides")
    return p.parse_args(argv)


def param_census(params) -> dict:
    """Parameter counts by module group (main.py:67-96)."""
    import jax

    groups = {"backbone": 0, "neck": 0, "head": 0, "other": 0}
    for key, sub in params.items():
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(sub))
        if key == "base":
            groups["backbone"] += n
        elif key in ("dla_up", "ida_up"):
            groups["neck"] += n
        elif key.startswith("detect_head"):
            groups["head"] += n
        else:
            groups["other"] += n
    groups["total"] = sum(groups.values())
    return groups


def main(argv=None):
    args = parse_args(argv)

    from .data import get_dataset
    from .models import build_model
    from .runtime.fit import Trainer
    from .utils.observability import create_logger

    # two-phase config: dataset class metadata feeds derived fields
    from .config import default_config, update_config, finalize_config

    config = default_config()
    update_config(config, args.cfg, args.opts)

    if config.TPU.PLATFORM:
        # must precede any jax backend query (the axon image overrides
        # JAX_PLATFORMS; see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", config.TPU.PLATFORM)
    if config.TPU.DEBUG_NANS:
        import jax

        jax.config.update("jax_debug_nans", True)

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dataset_cls = get_dataset(config.DATASET.DATASET)
    logger, out_dir = create_logger("output", config.NAME)
    config = finalize_config(
        config, dataset_cls.num_categories, dataset_cls.default_resolution, out_dir
    )

    model = build_model(config)
    val_split = config.DATASET.VAL_SPLIT
    dataset_val = dataset_cls(config, val_split)

    if config.EVAL:
        trainer = Trainer(config, model, None, dataset_val, out_dir, logger)
        if val_split == "test":
            trainer.test()
        else:
            trainer.val()
        return trainer

    dataset_train = dataset_cls(config, config.DATASET.TRAIN_SPLIT)
    trainer = Trainer(config, model, dataset_train, dataset_val, out_dir, logger)
    trainer.train()
    if trainer.state is not None:
        logger.info("param census: %s", param_census(trainer.state.params))
    return trainer


if __name__ == "__main__":
    main()
