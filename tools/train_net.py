#!/usr/bin/env python
"""Training CLI (reference: tools/train_net.py).

One process drives all local TPU chips through a jax.sharding data mesh —
no torch.distributed.launch, no per-GPU processes. Multi-host runs call
jax.distributed.initialize() when JAX_COORDINATOR_ADDRESS is set.

Usage:
    python tools/train_net.py --config-file configs/oneshot_fcos_r50.yaml \
        [SOLVER.MAX_ITER 1000 ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="One-Shot Detection Training (TPU)")
    parser.add_argument("--config-file", default="", type=str)
    parser.add_argument("--skip-test", action="store_true")
    parser.add_argument("--use-tensorboard", action="store_true")
    parser.add_argument("--device", default="", help="force jax platform (e.g. cpu)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.data import make_data_loader
    from oneshotdet_tpu.engine import (
        create_train_state,
        do_train,
        jit_train_step,
        make_train_step,
    )
    from oneshotdet_tpu.engine.trainer import batch_to_inputs
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.parallel import make_mesh
    from oneshotdet_tpu.solver import make_optimizer
    from oneshotdet_tpu.utils.checkpoint import Checkpointer
    from oneshotdet_tpu.utils.logger import setup_logger
    from oneshotdet_tpu.utils.metric_logger import MetricLogger, TensorboardLogger

    c = cfg.clone()
    if args.config_file:
        c.merge_from_file(args.config_file)
    if args.opts:
        c.merge_from_list(args.opts)
    c.freeze()

    logger = setup_logger("oneshotdet_tpu", c.OUTPUT_DIR)
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"config:\n{c}")

    mesh = make_mesh(tuple(c.TPU.MESH_AXES),
                     shape=tuple(c.TPU.MESH_SHAPE) or None)
    model = build_detection_model(c)

    n_proc = jax.process_count()
    # init on CPU (eager init over a device tunnel is pathological), then
    # transfer to the mesh
    loader, dataset = make_data_loader(
        c, is_train=True, is_distributed=n_proc > 1,
        num_replicas=n_proc, rank=jax.process_index(),
    )
    first_batch = next(iter(loader))
    cpu = jax.devices("cpu")[0]
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    with jax.default_device(cpu), disable_pallas():
        images, supp, targets = batch_to_inputs(
            {k: jnp.asarray(v[:1] if v.ndim else v) for k, v in first_batch.items()
             if k not in ("img_ids", "idxs")}
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            images, supp, targets, train=True, rng=jax.random.PRNGKey(1),
        )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model parameters: {n_params / 1e6:.1f}M")

    optimizer, _ = make_optimizer(c, variables["params"])
    state = create_train_state(model, optimizer, variables)

    checkpointer = Checkpointer(c.OUTPUT_DIR, logger, cfg=c)
    if c.MODEL.FSS_WEIGHT:
        # dual-checkpoint FSS load (reference tools/train_net.py:100-110):
        # stage-1 (fcos) weights come from FSS_WEIGHT, everything else from
        # WEIGHT — realized as two partial loads
        state = checkpointer.load(state, f=c.MODEL.FSS_WEIGHT, resume=False)
        state = checkpointer.load(
            state, f=c.MODEL.WEIGHT or None,
            unload_keywords=tuple(c.FEW_SHOT.UNLOAD_KEYWORD) + ("fcos_head",),
            resume=c.FEW_SHOT.RESUME,
        )
    else:
        state = checkpointer.load(
            state,
            f=c.MODEL.WEIGHT or None,
            unload_keywords=c.FEW_SHOT.UNLOAD_KEYWORD,
            resume=c.FEW_SHOT.RESUME,
        )
    start_iter = int(state.step)

    from oneshotdet_tpu.parallel.mesh import replicate

    if "model" in mesh.axis_names:
        # 2-D dp x (tp+sp): TP params + matching opt_state shardings
        # (checkpoint-loaded values preserved); batch sharding in do_train
        # routes through shard_batch_2d for the spatial pixel shard
        from oneshotdet_tpu.parallel import shard_train_state

        state = shard_train_state(state, optimizer, mesh)
    else:
        state = replicate(state, mesh)
    train_step = jit_train_step(make_train_step(model, optimizer), mesh)

    meters = (
        TensorboardLogger(c.TENSORBOARD_EXPERIMENT, start_iter)
        if args.use_tensorboard
        else MetricLogger()
    )

    if start_iter:
        loader, dataset = make_data_loader(
            c, is_train=True, start_iter=start_iter,
            is_distributed=n_proc > 1, num_replicas=n_proc,
            rank=jax.process_index(),
        )
    do_train(
        c, model, train_step, state, loader, mesh,
        checkpointer=checkpointer, meters=meters, start_iter=start_iter,
        logger=logger,
    )


if __name__ == "__main__":
    main()
